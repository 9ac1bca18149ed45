package graft.delta

import graft.condition._
import graft.json._

/**
 * Text parser for the delta + condition DSLs.
 * Grammar parity: sor-api/.../delta/deser/DeltaParser.java:78-405 over the
 * tokener rules of JsonTokener.java (strict JSON values; unquoted word
 * tokens for keywords/functions; `(`/`)` argument lists).
 */
object DslParser {

  def parseDelta(text: String): Delta = {
    val t = new Tokener(text)
    val d = new DslParser(t).parseDelta()
    if (t.nextClean() != 0) throw t.syntaxError("Unexpected characters at the end of the string")
    d
  }

  def parseCondition(text: String): Condition = {
    val t = new Tokener(text)
    val c = new DslParser(t).parseCondition()
    if (t.nextClean() != 0) throw t.syntaxError("Unexpected characters at the end of the string")
    c
  }
}

private final class DslParser(t: Tokener) {

  // ---------------------------------------------------------------- deltas

  def parseDelta(): Delta = {
    t.lookAhead() match {
      case '.' =>
        t.next('.'); t.next('.')
        NoopDelta
      case '~' =>
        t.next('~')
        DeleteDelta
      case '(' => parseSetDelta()
      case '{' => parseMapDelta()
      case '[' => Literal(t.nextArray())
      case '"' => Literal(JString(t.nextString()))
      case _ =>
        val token = t.nextToken()
        if (token == "if") parseConditionalDelta()
        else Literal(t.tokenToValue(token))
    }
  }

  private def parseSetDelta(): Delta = {
    var removeRest = true
    val added = Set.newBuilder[JValue]
    val removed = Set.newBuilder[JValue]
    if (t.startArgs('(', ')')) {
      var more = true
      if (t.lookAhead() == '.') { // (..,) = keep values not mentioned
        t.next('.'); t.next('.')
        removeRest = false
        more = t.nextArg(',', ')')
      }
      while (more) {
        var remove = false
        if (t.lookAhead() == '~') { t.next('~'); remove = true }
        val d = parseDelta()
        d match {
          case Literal(v) => if (remove) removed += v else added += v
          case other => throw t.syntaxError(s"Non-literal values not supported in sets: $other")
        }
        more = t.nextArg(',', ')')
      }
    }
    val deleteIfEmpty = consumeOptionalQuestion()
    SetDelta(added.result(), removed.result(), removeRest, deleteIfEmpty)
  }

  private def parseMapDelta(): Delta = {
    var removeRest = true
    val entries = Map.newBuilder[String, Delta]
    if (t.startArgs('{', '}')) {
      var more = true
      if (t.lookAhead() == '.') { // {..,} = keep keys not mentioned
        t.next('.'); t.next('.')
        removeRest = false
        more = t.nextArg(',', '}')
      }
      while (more) {
        val key = t.nextString()
        t.nextClean(':')
        entries += (key -> parseDelta())
        more = t.nextArg(',', '}')
      }
    }
    val deleteIfEmpty = consumeOptionalQuestion()
    Deltas.buildMap(entries.result(), removeRest, deleteIfEmpty)
  }

  private def consumeOptionalQuestion(): Boolean = {
    val c = t.next()
    if (c == '?') true
    else {
      if (c != 0) t.back()
      false
    }
  }

  /** `if` already consumed. `if c then d [elif c2 then d2] [else e] end` */
  private def parseConditionalDelta(): Delta = {
    val test = parseCondition()
    val thenTok = t.nextToken()
    if (thenTok != "then") throw t.syntaxError(s"Expected 'then' and instead saw '$thenTok'")
    val thenDelta = parseDelta()
    var next = t.nextToken()
    if (next == "elif") {
      // recursive call consumes the 'end'
      return Deltas.conditional(test, thenDelta, parseConditionalDelta())
    }
    var elseDelta: Delta = NoopDelta
    if (next == "else") {
      elseDelta = parseDelta()
      next = t.nextToken()
    }
    if (next != "end") throw t.syntaxError(s"Expected 'end' and instead saw '$next'")
    Deltas.conditional(test, thenDelta, elseDelta)
  }

  // ------------------------------------------------------------- conditions

  def parseCondition(): Condition = {
    val ch = t.lookAhead()
    ch match {
      case '{' => return parseMapCondition()
      case '~' => t.next('~'); return Conditions.isUndefined
      case '+' => t.next('+'); return Conditions.isDefined
      case '[' | '"' => return Conditions.equal(t.nextValue())
      case _ =>
    }
    val token = t.nextToken()
    if (ch >= 'a' && ch <= 'z') {
      token match {
        case "alwaysTrue"   => checkNoArgs(token); return Conditions.alwaysTrue
        case "alwaysFalse"  => checkNoArgs(token); return Conditions.alwaysFalse
        case "in"           => return parseInCondition()
        case "intrinsic"    => return parseIntrinsicCondition()
        case "is"           => return parseIsCondition()
        case "gt"           => return parseComparisonCondition(Comparison.GT)
        case "ge"           => return parseComparisonCondition(Comparison.GE)
        case "lt"           => return parseComparisonCondition(Comparison.LT)
        case "le"           => return parseComparisonCondition(Comparison.LE)
        case "like"         => return parseLikeCondition()
        case "not"          =>
          val args = parseConditionArgs(token)
          if (args.size != 1) throw t.syntaxError("Expected exactly one argument to the not() function")
          return Conditions.not(args.head)
        case "or"           => return Conditions.or(parseConditionArgs(token))
        case "and"          => return Conditions.and(parseConditionArgs(token))
        case "contains"     => return parseContains()
        case "containsAny"  => return Conditions.containsAny(parseValueArgs("containsAny"))
        case "containsAll"  => return Conditions.containsAll(parseValueArgs("containsAll"))
        case "containsOnly" => return Conditions.containsOnly(parseValueArgs("containsOnly"))
        case "partition"    => return parsePartitionCondition()
        case _ =>
      }
    }
    Conditions.equal(t.tokenToValue(token))
  }

  private def checkNoArgs(function: String): Unit =
    if (t.startArgs('(', ')', function))
      throw t.syntaxError(s"Expected zero arguments to the $function() function")

  private def parseConditionArgs(function: String): Seq[Condition] = {
    val out = Seq.newBuilder[Condition]
    if (t.startArgs('(', ')', function)) {
      var more = true
      while (more) {
        out += parseCondition()
        more = t.nextArg(',', ')')
      }
    }
    out.result()
  }

  private def parseValueArgs(function: String): Seq[JValue] = {
    val out = Seq.newBuilder[JValue]
    if (t.startArgs('(', ')', function)) {
      var more = true
      while (more) {
        out += t.nextValue()
        more = t.nextArg(',', ')')
      }
    }
    out.result()
  }

  private def parseInCondition(): Condition = {
    Conditions.in(parseValueArgs("in"))
  }

  private def parseIntrinsicCondition(): Condition = {
    t.nextClean('(')
    val name = t.nextString()
    t.nextClean(':')
    val conditions = Seq.newBuilder[Condition]
    var more = true
    while (more) {
      conditions += parseCondition()
      more = t.nextArg(',', ')')
    }
    Conditions.intrinsic(name, Conditions.or(conditions.result()))
  }

  private def parseIsCondition(): Condition = {
    t.nextClean('(')
    val token = t.nextToken()
    t.nextClean(')')
    val state = token match {
      case "undefined" => State.UNDEFINED
      case "defined"   => State.DEFINED
      case "null"      => State.NULL
      case "bool"      => State.BOOL
      case "num"       => State.NUM
      case "string"    => State.STRING
      case "array"     => State.ARRAY
      case "object"    => State.OBJECT
      case other       => throw t.syntaxError(s"Unknown state '$other'")
    }
    Conditions.is(state)
  }

  private def parseMapCondition(): Condition = {
    if (!t.startArgs('{', '}')) {
      // plain {} = equality against empty map
      return Conditions.equal(JObj(Map.empty))
    }
    if (t.lookAhead() == '.') {
      t.next('.'); t.next('.')
      val entries = Map.newBuilder[String, Condition]
      while (t.nextArg(',', '}')) {
        val key = t.nextString()
        t.nextClean(':')
        entries += (key -> parseCondition())
      }
      MapCondition(entries.result())
    } else {
      // equality against a map literal
      val fields = Map.newBuilder[String, JValue]
      var more = true
      while (more) {
        val key = t.nextString()
        t.nextClean(':')
        fields += (key -> t.nextValue())
        more = t.nextArg(',', '}')
      }
      Conditions.equal(JObj(fields.result()))
    }
  }

  private def parseComparisonCondition(op: Comparison.Comparison): Condition = {
    t.nextClean('(')
    val v = t.nextValue()
    t.nextClean(')')
    Conditions.compare(op, v)
  }

  private def parseContains(): Condition = {
    t.nextClean('(')
    val v = t.nextValue()
    t.nextClean(')')
    Conditions.contains(v)
  }

  private def parseLikeCondition(): Condition = {
    t.nextClean('(')
    val pattern = t.nextString()
    t.nextClean(')')
    Conditions.like(pattern)
  }

  private def parsePartitionCondition(): Condition = {
    t.nextClean('(')
    val n = t.nextValue() match {
      case JLong(v) => v.toInt
      case JDouble(v) => v.toInt
      case other => throw t.syntaxError(s"Expected a partition count, saw $other")
    }
    t.nextClean(':')
    val conditions = Seq.newBuilder[Condition]
    var more = true
    while (more) {
      conditions += parseCondition()
      more = t.nextArg(',', ')')
    }
    Conditions.partition(n, Conditions.or(conditions.result()))
  }
}
