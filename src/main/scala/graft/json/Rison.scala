package graft.json

/**
 * Rison / O-Rison codec — the compact URL-safe JSON variant the reference
 * accepts for audit parameters (common/json/RisonHelper.java:44-60, using
 * the O-Rison mode where the top-level value is an object and its
 * surrounding parentheses are omitted). Grammar per the public Rison spec
 * (mjtemplate.org/examples/rison.html):
 *
 *   `!t` / `!f` / `!n`  booleans and null
 *   `(k:v,k:v)`         objects, `!(v,v)` arrays
 *   bare identifiers    strings not starting with a digit/'-' and free of
 *                       whitespace and `'!:(),*@$`
 *   `'...'`             other strings, with `!!` → `!` and `!'` → `'`
 *   numbers             decimal int/frac/exp ('e', no '+')
 *
 * Encoding is CANONICAL: object keys sort like [[JsonCodec]]'s canonical
 * JSON (the reference's Jackson encoder keeps insertion order, which is
 * not reproducible across engines — sorted keys make the encoding a pure
 * function of the value, the property every oracle here relies on).
 * Whitespace is significant (Rison has no insignificant whitespace), so
 * decode is strict.
 */
object Rison {

  // ------------------------------------------------------------- encoding

  private val NotIdChar = "'!:(),*@$"

  private def isIdChar(c: Char): Boolean =
    !c.isWhitespace && NotIdChar.indexOf(c.toInt) < 0

  private def isId(s: String): Boolean =
    s.nonEmpty && isIdChar(s.charAt(0)) && s.charAt(0) != '-' &&
      !s.charAt(0).isDigit && s.forall(isIdChar)

  private def appendString(sb: java.lang.StringBuilder, s: String): Unit =
    if (isId(s)) { sb.append(s); () }
    else {
      sb.append('\'')
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' => sb.append("!'")
          case '!'  => sb.append("!!")
          case c    => sb.append(c)
        }
        i += 1
      }
      sb.append('\'')
      ()
    }

  private def append(sb: java.lang.StringBuilder, v: JValue): Unit = v match {
    case JNull      => sb.append("!n"); ()
    case JBool(b)   => sb.append(if (b) "!t" else "!f"); ()
    case JLong(n)   => sb.append(n); ()
    case JDouble(n) =>
      if (n.isNaN || n.isInfinite)
        throw new IllegalArgumentException("non-finite numbers are not Rison")
      // Java renders scientific notation with 'E'; the Rison grammar only
      // admits lowercase 'e' (no '+', which Double.toString never emits) —
      // lowercasing keeps encode(decode) and spec-parser compatibility for
      // magnitudes like 1e21 / 1e-5
      sb.append(java.lang.Double.toString(n).replace('E', 'e')); ()
    case JString(s) => appendString(sb, s)
    case JArr(items) =>
      sb.append("!(")
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        append(sb, it)
      }
      sb.append(')')
      ()
    case JObj(fields) =>
      sb.append('(')
      appendObjBody(sb, fields)
      sb.append(')')
      ()
    case JUndefined =>
      throw new IllegalArgumentException("UNDEFINED has no Rison representation")
  }

  private def appendObjBody(sb: java.lang.StringBuilder, fields: Map[String, JValue]): Unit = {
    var first = true
    fields.keys.toArray.sorted(JsonCodec.keyOrdering).foreach { k =>
      if (!first) sb.append(',')
      first = false
      appendString(sb, k)
      sb.append(':')
      append(sb, fields(k))
    }
  }

  /** Full Rison: any value, objects parenthesized. */
  def encode(v: JValue): String = {
    val sb = new java.lang.StringBuilder
    append(sb, v)
    sb.toString
  }

  /** O-Rison: the value must be an object; outer parens omitted
    * (RisonGenerator.Feature.O_RISON). */
  def encodeORison(v: JValue): String = v match {
    case JObj(fields) =>
      val sb = new java.lang.StringBuilder
      appendObjBody(sb, fields)
      sb.toString
    case other =>
      throw new IllegalArgumentException(s"O-Rison requires an object, got $other")
  }

  // ------------------------------------------------------------- decoding

  private final class P(val s: String) {
    var i = 0
    def more: Boolean = i < s.length
    def peek: Char = s.charAt(i)
    def next(): Char = { val c = s.charAt(i); i += 1; c }
    def expect(c: Char): Unit =
      if (!more || next() != c)
        throw new IllegalArgumentException(
          s"malformed Rison: expected '$c' at ${i - 1} in: $s")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed Rison: $msg at $i in: $s")
  }

  private def parseValue(p: P): JValue = {
    if (!p.more) p.fail("unexpected end")
    p.peek match {
      case '!' =>
        p.next()
        if (!p.more) p.fail("dangling '!'")
        p.next() match {
          case 't' => JBool(true)
          case 'f' => JBool(false)
          case 'n' => JNull
          case '(' =>
            val items = Vector.newBuilder[JValue]
            if (p.more && p.peek == ')') p.next()
            else {
              var done = false
              while (!done) {
                items += parseValue(p)
                if (!p.more) p.fail("unterminated array")
                p.next() match {
                  case ',' => ()
                  case ')' => done = true
                  case c   => p.fail(s"unexpected '$c' in array")
                }
              }
            }
            JArr(items.result())
          case c => p.fail(s"unknown escape '!$c'")
        }
      case '(' => p.next(); parseObjBody(p, untilParen = true)
      case '\'' => p.next(); JString(parseQuoted(p))
      case c if c == '-' || c.isDigit => parseNumber(p)
      case c if isIdChar(c) => JString(parseId(p))
      case c => p.fail(s"unexpected '$c'")
    }
  }

  private def parseQuoted(p: P): String = {
    val sb = new java.lang.StringBuilder
    var done = false
    while (!done) {
      if (!p.more) p.fail("unterminated string")
      p.next() match {
        case '\'' => done = true
        case '!' =>
          if (!p.more) p.fail("dangling '!' in string")
          p.next() match {
            case '!'  => sb.append('!'); ()
            case '\'' => sb.append('\''); ()
            case c    => p.fail(s"unknown string escape '!$c'")
          }
        case c => sb.append(c); ()
      }
    }
    sb.toString
  }

  private def parseId(p: P): String = {
    val start = p.i
    while (p.more && isIdChar(p.peek)) p.next()
    p.s.substring(start, p.i)
  }

  private def parseNumber(p: P): JValue = {
    val start = p.i
    if (p.more && p.peek == '-') p.next()
    while (p.more && p.peek.isDigit) p.next()
    var isDouble = false
    if (p.more && p.peek == '.') {
      isDouble = true
      p.next()
      while (p.more && p.peek.isDigit) p.next()
    }
    if (p.more && p.peek == 'e') {
      isDouble = true
      p.next()
      if (p.more && p.peek == '-') p.next()
      while (p.more && p.peek.isDigit) p.next()
    }
    val text = p.s.substring(start, p.i)
    try {
      if (isDouble) JDouble(text.toDouble)
      else
        try JLong(text.toLong)
        catch { case _: NumberFormatException => JDouble(text.toDouble) }
    } catch {
      case _: NumberFormatException => p.fail(s"malformed number '$text'")
    }
  }

  private def parseObjBody(p: P, untilParen: Boolean): JValue = {
    val fields = Map.newBuilder[String, JValue]
    def atEnd: Boolean =
      if (untilParen) p.more && p.peek == ')' else !p.more
    if (atEnd) { if (untilParen) p.next(); return JObj(fields.result()) }
    var done = false
    while (!done) {
      val key = if (p.more && p.peek == '\'') { p.next(); parseQuoted(p) }
        else {
          val id = parseId(p)
          if (id.isEmpty) p.fail("empty bare key") // '' quotes an empty key
          id
        }
      p.expect(':')
      fields += key -> parseValue(p)
      if (untilParen) {
        if (!p.more) p.fail("unterminated object")
        p.next() match {
          case ',' => ()
          case ')' => done = true
          case c   => p.fail(s"unexpected '$c' in object")
        }
      } else if (!p.more) done = true
      else p.expect(',')
    }
    JObj(fields.result())
  }

  /** Full Rison decode of any value; rejects trailing input. */
  def decode(s: String): JValue = {
    val p = new P(s)
    val v = parseValue(p)
    if (p.more) p.fail("trailing input")
    v
  }

  /** O-Rison decode: the whole string is one object body (empty string =
    * empty object), matching RisonParser.Feature.O_RISON. */
  def decodeORison(s: String): JValue = {
    val p = new P(s)
    val v = parseObjBody(p, untilParen = false)
    if (p.more) p.fail("trailing input")
    v
  }
}
