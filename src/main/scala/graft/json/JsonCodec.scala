package graft.json

import scala.collection.mutable

/**
 * Canonical JSON text <-> JValue.
 *
 * Printing parity with the reference's canonical output ordering
 * (common/json/.../OrderedJson.java:18-35): object keys sorted, keys
 * starting with '~' (intrinsics) first.
 *
 * Parsing accepts strict JSON (no comments, no unquoted strings, lowercase
 * true/false/null) like the reference's tokener
 * (sor-api/.../delta/deser/JsonTokener.java). Integral numbers without
 * '.', 'e', 'E' parse as JLong; everything else numeric as JDouble.
 */
object JsonCodec {

  // ---------------------------------------------------------------- printing

  /** Canonical key order: '~'-prefixed keys first, then sorted. */
  val keyOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val ai = a.startsWith("~")
      val bi = b.startsWith("~")
      if (ai != bi) { if (ai) -1 else 1 }
      else a.compareTo(b)
    }
  }

  def render(v: JValue): String = {
    val sb = new java.lang.StringBuilder
    append(sb, v)
    sb.toString
  }

  def append(sb: java.lang.StringBuilder, v: JValue): Unit = v match {
    case JNull       => sb.append("null")
    case JBool(b)    => sb.append(if (b) "true" else "false")
    case JLong(n)    => sb.append(n)
    case JDouble(n)  =>
      if (n.isNaN || n.isInfinite)
        throw new IllegalArgumentException("non-finite numbers are not JSON")
      sb.append(n)
    case JString(s)  => appendString(sb, s)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        append(sb, it)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.keys.toArray.sorted(keyOrdering).foreach { k =>
        if (!first) sb.append(',')
        first = false
        appendString(sb, k)
        sb.append(':')
        append(sb, fields(k))
      }
      sb.append('}')
    case JUndefined =>
      throw new IllegalArgumentException("UNDEFINED has no JSON representation")
  }

  def appendString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  // ----------------------------------------------------------------- parsing

  def parse(text: String): JValue = {
    val t = new Tokener(text)
    val v = t.nextValue()
    if (t.nextClean() != 0) throw t.syntaxError("Unexpected trailing characters")
    v
  }

  /** Null-tolerant parse used at Spark boundaries: null/empty -> UNDEFINED. */
  def parseOrUndefined(text: String): JValue =
    if (text == null || text.isEmpty) JUndefined else parse(text)
}

final class ParseException(msg: String) extends RuntimeException(msg)

/**
 * Character tokener shared by the JSON parser and both DSL parsers.
 * Token-boundary and argument-list rules follow the reference grammar
 * (JsonTokener.java:246-258, 330-380) so the DSL surface syntax is
 * accepted verbatim.
 */
final class Tokener(src: String) {
  private var i = 0

  private val TerminatorChars = ",:]})>/\\\"[{(<;=#?"

  def more: Boolean = i < src.length

  def next(): Char = {
    if (i >= src.length) { i += 1; 0 }
    else { val c = src.charAt(i); i += 1; c }
  }

  def next(expected: Char): Char = {
    val c = next()
    if (c != expected) throw syntaxError(s"Expected '$expected' and instead saw '$c'")
    c
  }

  def back(): Unit = {
    require(i > 0)
    i -= 1
  }

  /** Next non-whitespace char, 0 at end. */
  def nextClean(): Char = {
    while (true) {
      val c = next()
      if (c == 0 || c > ' ') return c
    }
    0 // unreachable
  }

  def nextClean(expected: Char): Char = {
    val c = nextClean()
    if (c != expected) throw syntaxError(s"Expected '$expected' and instead saw '$c'")
    c
  }

  /** Peek at the next non-whitespace char without consuming it. */
  def lookAhead(): Char = {
    val c = nextClean()
    if (c != 0) back()
    c
  }

  def syntaxError(msg: String): ParseException =
    new ParseException(s"$msg at character $i of $src")

  /** Quoted string with JSON escapes. */
  def nextString(): String = {
    val q = nextClean()
    if (q != '"') throw syntaxError(s"Expected '\"' and instead saw '$q'")
    val sb = new java.lang.StringBuilder
    while (true) {
      val c = next()
      c match {
        case 0 | '\n' | '\r' => throw syntaxError("Unterminated string")
        case '\\' =>
          next() match {
            case 'b' => sb.append('\b')
            case 't' => sb.append('\t')
            case 'n' => sb.append('\n')
            case 'f' => sb.append('\f')
            case 'r' => sb.append('\r')
            case 'u' =>
              val hex = src.substring(i, math.min(i + 4, src.length))
              if (hex.length < 4) throw syntaxError("Invalid \\u escape")
              i += 4
              sb.append(Integer.parseInt(hex, 16).toChar)
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case e    => throw syntaxError(s"Illegal escape '\\$e'")
          }
        case '"' => return sb.toString
        case _   => sb.append(c)
      }
    }
    null // unreachable
  }

  /** Unquoted word/number token (terminated by whitespace or a structural char). */
  def nextToken(): String = {
    var c = nextClean()
    val start = i - 1
    while (c > ' ' && TerminatorChars.indexOf(c) == -1) c = next()
    back()
    val token = src.substring(start, i).trim
    if (token.isEmpty) throw syntaxError("Missing value")
    token
  }

  /** DELIBERATE reference parity (JsonTokener.java:276-298): the guard +
    * Double.parseDouble fallback accepts everything the reference accepts,
    * including non-JSON spellings parseDouble allows ('-Infinity', hex
    * floats like '0x1p3', type suffixes like '1d'). Tightening this would
    * diverge from the wire grammar. */
  def tokenToValue(s: String): JValue = {
    if (s == "true") return JValue.JTrue
    if (s == "false") return JValue.JFalse
    if (s == "null") return JNull
    val b = s.charAt(0)
    if ((b >= '0' && b <= '9') || b == '-') {
      if (s.indexOf('.') == -1 && s.indexOf('e') == -1 && s.indexOf('E') == -1) {
        try return JLong(java.lang.Long.parseLong(s))
        catch { case _: NumberFormatException => }
      }
      try return JDouble(java.lang.Double.parseDouble(s))
      catch { case _: NumberFormatException => }
    }
    throw syntaxError("Expected a valid value (number, string, array, object, 'true', 'false' or 'null')")
  }

  def nextValue(): JValue = {
    lookAhead() match {
      case '"' => JString(nextString())
      case '{' => nextObject()
      case '[' => nextArray()
      case _   => tokenToValue(nextToken())
    }
  }

  def nextArray(): JArr = {
    val items = Vector.newBuilder[JValue]
    if (startArgs('[', ']')) {
      var more = true
      while (more) {
        items += nextValue()
        more = nextArg(',', ']')
      }
    }
    JArr(items.result())
  }

  def nextObject(): JObj = {
    val fields = mutable.LinkedHashMap.empty[String, JValue]
    if (startArgs('{', '}')) {
      var more = true
      while (more) {
        val key = nextString()
        nextClean(':')
        if (fields.contains(key)) throw new ParseException(s"""Duplicate key "$key"""")
        fields.put(key, nextValue())
        more = nextArg(',', '}')
      }
    }
    JObj(fields.toMap)
  }

  /** Consume the opener; true if the arg list is non-empty. */
  def startArgs(open: Char, close: Char): Boolean = startArgs(open, close, null)

  def startArgs(open: Char, close: Char, function: String): Boolean = {
    val c = nextClean()
    if (c != open) {
      if (function == null) throw syntaxError(s"Expected '$open' and instead saw '$c'")
      else throw syntaxError(s"Expected '$open' after '$function' function and instead saw '$c'")
    }
    if (lookAhead() == close) { next(); false } else true
  }

  /** After an argument: ',' means another follows, the closer ends the list. */
  def nextArg(sep: Char, close: Char): Boolean = {
    val c = nextClean()
    if (c == sep) {
      if (lookAhead() == close) throw syntaxError(s"Missing value before '$close'")
      true
    } else if (c == close) false
    else throw syntaxError(s"Expected '$sep' or '$close' and instead saw '$c'")
  }
}
