package graft.condition

import graft.json._

/**
 * The condition DSL — the engine's WHERE-clause language (17 node types).
 *
 * AST shape follows the reference surface (sor-api/.../condition package,
 * grammar sor-api/.../delta/deser/DeltaParser.java:207-405); semantics in
 * [[ConditionEvaluator]] follow
 * sor-api/.../condition/eval/ConditionEvaluator.java.
 */
sealed trait Condition extends Serializable {
  override def toString: String = ConditionPrinter.print(this)
}

object State extends Enumeration {
  type State = Value
  val UNDEFINED, DEFINED, NULL, BOOL, NUM, STRING, ARRAY, OBJECT = Value
}

object Comparison extends Enumeration {
  type Comparison = Value
  val GT, GE, LT, LE = Value
}

object Containment extends Enumeration {
  type Containment = Value
  val ANY, ALL, ONLY = Value
}

final case class ConstantCondition(value: Boolean) extends Condition
final case class EqualCondition(value: JValue) extends Condition
final case class InCondition(values: Set[JValue]) extends Condition
final case class IsCondition(state: State.State) extends Condition
final case class ComparisonCondition(op: Comparison.Comparison, value: JValue) extends Condition
final case class ContainsCondition(values: Set[JValue], containment: Containment.Containment) extends Condition
final case class NotCondition(condition: Condition) extends Condition
final case class AndCondition(conditions: Seq[Condition]) extends Condition
final case class OrCondition(conditions: Seq[Condition]) extends Condition
final case class MapCondition(entries: Map[String, Condition]) extends Condition
final case class IntrinsicCondition(name: String, condition: Condition) extends Condition
final case class PartitionCondition(numPartitions: Int, condition: Condition) extends Condition {
  // PartitionConditionImpl.java:36 parity — and without it, partition(0:...)
  // only fails at EVALUATION time with a modulo-by-zero on every executor
  require(numPartitions > 0, "Number of partitions must be at least 1")
}

/**
 * Glob pattern with '*' as the only wildcard ('\*' escapes a literal star).
 * Matches strings only (LikeConditionImpl.java:30-128). The pattern is
 * pre-split into literal segments for fast prefix/suffix/contains paths.
 */
final case class LikeCondition(pattern: String) extends Condition {
  // segments between stars; leadingStar/trailingStar describe the ends
  @transient private lazy val compiled: (Boolean, Boolean, Vector[String]) =
    LikeCondition.compile(pattern)

  def matches(s: String): Boolean = {
    val (leadingStar, trailingStar, segs) = compiled
    if (segs.isEmpty) return leadingStar || trailingStar || s.isEmpty // "*" or ""
    var pos = 0
    var idx = 0
    // first segment anchored unless leading star
    if (!leadingStar) {
      val h = segs.head
      if (!s.startsWith(h)) return false
      pos = h.length
      idx = 1
    }
    // last segment anchored unless trailing star (handled after scan)
    val lastAnchored = !trailingStar
    val scanEnd = if (lastAnchored) segs.length - 1 else segs.length
    while (idx < scanEnd) {
      val seg = segs(idx)
      val found = s.indexOf(seg, pos)
      if (found < 0) return false
      pos = found + seg.length
      idx = 1 + idx
    }
    if (lastAnchored) {
      val tail = segs.last
      // tail must be at the very end, at or after pos (no overlap with consumed prefix)
      if (segs.length == 1 && !leadingStar) pos == s.length // exact match already consumed
      else s.length - tail.length >= pos && s.endsWith(tail)
    } else true
  }
}

object LikeCondition {

  /** Unescaped pattern: the effective chars plus a parallel mask marking
    * which are literal (were escaped). An unescaped '*' is the wildcard;
    * escaped chars — INCLUDING escaped stars and backslashes — are literal. */
  private[graft] final case class Unescaped(chars: Array[Char], literal: Array[Boolean]) {
    def isWildcard(i: Int): Boolean = chars(i) == '*' && !literal(i)
  }

  /** Reference-parity unescaping (LikeConditionImpl.create, :40-80):
    * backslash escapes the NEXT character whatever it is ("a\\b" denotes
    * "ab"), a terminal backslash is rejected, and runs of consecutive
    * unescaped wildcards collapse to one. */
  private[graft] def unescape(pattern: String): Unescaped = {
    val chars = new Array[Char](pattern.length)
    val literal = new Array[Boolean](pattern.length)
    var n = 0
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\') {
        if (i == pattern.length - 1)
          throw new IllegalArgumentException(
            s"Invalid terminal escape character at position $i")
        chars(n) = pattern.charAt(i + 1); literal(n) = true; n += 1; i += 2
      } else {
        // collapse consecutive unescaped wildcards
        if (!(c == '*' && n > 0 && chars(n - 1) == '*' && !literal(n - 1))) {
          chars(n) = c; n += 1
        }
        i += 1
      }
    }
    Unescaped(java.util.Arrays.copyOf(chars, n), java.util.Arrays.copyOf(literal, n))
  }

  /** Split on wildcards; returns (leadingStar, trailingStar, literal
    * segments), all derived from the SAME unescaped form. */
  def compile(pattern: String): (Boolean, Boolean, Vector[String]) = {
    val u = unescape(pattern)
    val segs = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < u.chars.length) {
      if (u.isWildcard(i)) {
        if (cur.length > 0) { segs += cur.toString; cur.setLength(0) }
      } else cur.append(u.chars(i))
      i += 1
    }
    if (cur.length > 0) segs += cur.toString
    val lead = u.chars.length > 0 && u.isWildcard(0)
    val trail = u.chars.length > 0 && u.isWildcard(u.chars.length - 1)
    (lead, trail, segs.result())
  }

  /** True if the pattern contains no unescaped wildcard. */
  def isLiteral(pattern: String): Boolean = {
    val u = unescape(pattern)
    var i = 0
    while (i < u.chars.length) {
      if (u.isWildcard(i)) return false
      i += 1
    }
    true
  }

  /** The literal string the pattern denotes when [[isLiteral]]. */
  def literalValue(pattern: String): String = new String(unescape(pattern).chars)
}

/**
 * Smart constructors with the reference's build-time simplifications
 * (Conditions.java): empty in() -> alwaysFalse, singleton in() -> equal,
 * not(not(x)) -> x, like without wildcards -> equal, "*" -> is(string),
 * and/or flattening.
 */
object Conditions {
  val alwaysTrue: Condition = ConstantCondition(true)
  val alwaysFalse: Condition = ConstantCondition(false)

  def equal(v: JValue): Condition = EqualCondition(v)

  def in(values: Iterable[JValue]): Condition = {
    val set = values.toSet
    if (set.isEmpty) alwaysFalse
    else if (set.size == 1) EqualCondition(set.head)
    else InCondition(set)
  }

  def is(state: State.State): Condition = IsCondition(state)
  def isUndefined: Condition = IsCondition(State.UNDEFINED)
  def isDefined: Condition = IsCondition(State.DEFINED)

  def compare(op: Comparison.Comparison, v: JValue): Condition = ComparisonCondition(op, v)
  def gt(v: JValue): Condition = compare(Comparison.GT, v)
  def ge(v: JValue): Condition = compare(Comparison.GE, v)
  def lt(v: JValue): Condition = compare(Comparison.LT, v)
  def le(v: JValue): Condition = compare(Comparison.LE, v)

  def contains(v: JValue): Condition = ContainsCondition(Set(v), Containment.ALL)

  def containsAny(vs: Iterable[JValue]): Condition = {
    val set = vs.toSet
    if (set.isEmpty) alwaysTrue else ContainsCondition(set, Containment.ANY)
  }

  def containsAll(vs: Iterable[JValue]): Condition = {
    val set = vs.toSet
    if (set.isEmpty) alwaysTrue else ContainsCondition(set, Containment.ALL)
  }

  def containsOnly(vs: Iterable[JValue]): Condition =
    ContainsCondition(vs.toSet, Containment.ONLY)

  def like(pattern: String): Condition =
    if (LikeCondition.isLiteral(pattern)) EqualCondition(JString(LikeCondition.literalValue(pattern)))
    else if (pattern == "*") IsCondition(State.STRING)
    else LikeCondition(pattern)

  def not(c: Condition): Condition = c match {
    case NotCondition(inner)   => inner
    case ConstantCondition(b)  => ConstantCondition(!b)
    case other                 => NotCondition(other)
  }

  def and(cs: Seq[Condition]): Condition = {
    val flat = cs.flatMap {
      case AndCondition(inner) => inner
      case c                   => Seq(c)
    }
    if (flat.isEmpty) alwaysTrue
    else if (flat.size == 1) flat.head
    else AndCondition(flat)
  }

  /** OR with the reference builder's normalization
    * (OrConditionBuilderImpl.java:28-110): alwaysTrue short-circuits,
    * alwaysFalse drops, equal/in branches merge into ONE in() (an O(n)
    * scan becomes an O(1) set lookup), same-intrinsic branches merge into
    * intrinsic(name: or(...)) — the optimization the reference calls out
    * for large subscription conditions — nested ors flatten, and the
    * merged parts print in the builder's order: values, then intrinsics
    * by name, then everything else. */
  def or(cs: Seq[Condition]): Condition = {
    def flatten(xs: Seq[Condition]): Seq[Condition] = xs.flatMap {
      case OrCondition(inner) => flatten(inner)
      case c                  => Seq(c)
    }
    val flat = flatten(cs)
    if (flat.contains(ConstantCondition(true))) return alwaysTrue
    val values = scala.collection.mutable.LinkedHashSet.empty[JValue]
    val intrinsics = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Condition]]
    val others = Vector.newBuilder[Condition]
    flat.foreach {
      case ConstantCondition(false)      => ()
      case EqualCondition(v)             => values += v
      case InCondition(vs)               => values ++= vs
      case IntrinsicCondition(name, sub) =>
        intrinsics(name) = intrinsics.getOrElse(name, Vector.empty) :+ sub
      case c                             => others += c
    }
    val parts = Vector.newBuilder[Condition]
    if (values.nonEmpty) parts += in(values.toSeq)
    intrinsics.toSeq.sortBy(_._1).foreach { case (name, subs) =>
      parts += intrinsic(name, or(subs))
    }
    parts ++= others.result()
    val out = parts.result()
    if (out.isEmpty) alwaysFalse
    else if (out.size == 1) out.head
    else OrCondition(out)
  }

  def mapOf(entries: (String, Condition)*): Condition = MapCondition(entries.toMap)
  def intrinsic(name: String, c: Condition): Condition = IntrinsicCondition(name, c)
  def partition(n: Int, c: Condition): Condition = PartitionCondition(n, c)

  def fromString(text: String): Condition = graft.delta.DslParser.parseCondition(text)
}
