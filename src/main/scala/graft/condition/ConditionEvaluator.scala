package graft.condition

import graft.json._

/**
 * Document metadata visible to `intrinsic(...)` and `partition(...)`
 * conditions (sor-api/.../api/Intrinsic.java:15-27). Timestamps are carried
 * as ISO-8601 strings — the engine's JSON-native date representation —
 * so lexicographic string comparison orders them chronologically.
 * `~version` is deliberately unsupported in conditions
 * (ConditionEvaluator.java:80-83: unreliable under weak consistency).
 */
final case class IntrinsicsView(
    id: String,
    table: String,
    signature: String,
    deleted: Boolean,
    firstUpdateAt: String,
    lastUpdateAt: String,
    lastMutateAt: String,
    placement: String) {
  // memoized JValue wrappers for the intrinsics hot in multi-condition
  // evaluation (fanout tests N conditions against one view): transient
  // lazy, not constructor fields — equality/serialization untouched
  @transient lazy val jId: JValue = JString(id)
  @transient lazy val jTable: JValue = JString(table)
  @transient lazy val jPlacement: JValue = JString(placement)
}

/**
 * Evaluates a [[Condition]] against a JSON value at a position.
 * Semantics parity: sor-api/.../condition/eval/ConditionEvaluator.java.
 */
object ConditionEvaluator {

  def eval(c: Condition, json: JValue): Boolean = eval(c, json, null)

  def eval(c: Condition, json: JValue, intrinsics: IntrinsicsView): Boolean = c match {
    case ConstantCondition(b) => b

    // type-strict deep equality (Objects.equals): 3 != 3.0
    case EqualCondition(v) => v == json

    case InCondition(vs) => vs.contains(json)

    case IsCondition(state) =>
      import State._
      state match {
        case UNDEFINED => json eq JUndefined
        case DEFINED   => json ne JUndefined
        case NULL      => json eq JNull
        case BOOL      => json.isInstanceOf[JBool]
        case NUM       => JValue.isNumber(json)
        case STRING    => json.isInstanceOf[JString]
        case ARRAY     => json.isInstanceOf[JArr]
        case OBJECT    => json.isInstanceOf[JObj]
      }

    case ComparisonCondition(op, value) =>
      // null (and undefined) comparisons are always false
      if ((json eq JNull) || (json eq JUndefined) || (value eq JNull)) false
      else if (JValue.isNumber(json) && JValue.isNumber(value)) {
        val r = (json, value) match {
          case (JLong(a), JLong(b)) => java.lang.Long.compare(a, b)
          case _ => java.lang.Double.compare(JValue.doubleValue(json), JValue.doubleValue(value))
        }
        matchesComparison(op, r)
      } else (json, value) match {
        case (JString(a), JString(b)) => matchesComparison(op, a.compareTo(b))
        case _ => false // everything else unsupported => no match
      }

    case ContainsCondition(condValues, containment) =>
      import Containment._
      if (condValues.isEmpty && containment != ONLY) true
      else json match {
        case arr: JArr =>
          val values = arr.itemSet // memoized: N conditions probe one array
          containment match {
            case ANY  => condValues.exists(values.contains)
            case ALL  => condValues.forall(values.contains)
            case ONLY => condValues.forall(values.contains) && condValues.size == values.size
          }
        case _ => false // value is not a list
      }

    case lc @ LikeCondition(_) =>
      json match {
        case JString(s) => lc.matches(s)
        case _          => false // non-strings never match
      }

    case NotCondition(inner) => !eval(inner, json, intrinsics)

    case AndCondition(cs) => cs.forall(eval(_, json, intrinsics)) // empty => true

    case OrCondition(cs) => cs.exists(eval(_, json, intrinsics)) // empty => false

    case MapCondition(entries) =>
      json match {
        case o: JObj =>
          // missing field => UNDEFINED, so is(undefined) works
          entries.forall { case (k, sub) => eval(sub, o.get(k), intrinsics) }
        case _ => false
      }

    case IntrinsicCondition(name, sub) =>
      require(intrinsics != null, "May not reference intrinsic values from this context.")
      eval(sub, intrinsicValue(name, intrinsics), intrinsics)

    case PartitionCondition(n, sub) =>
      require(intrinsics != null, "May not reference intrinsic values from this context.")
      val modulo = Hashes.partitionOf(intrinsics.table, intrinsics.id, n)
      eval(sub, JLong(modulo), intrinsics)
  }

  private def matchesComparison(op: Comparison.Comparison, r: Int): Boolean = {
    import Comparison._
    op match {
      case LE => r <= 0
      case LT => r < 0
      case GE => r >= 0
      case GT => r > 0
    }
  }

  /** Intrinsic names referenced anywhere in a condition tree (partition()
    * counts as ~table/~id — its hash consumes both). */
  def referencedIntrinsics(c: Condition): Set[String] = c match {
    case IntrinsicCondition(n, sub) => referencedIntrinsics(sub) + n
    case PartitionCondition(_, sub) =>
      referencedIntrinsics(sub) + Intrinsic.Table + Intrinsic.Id
    case NotCondition(i)  => referencedIntrinsics(i)
    case AndCondition(cs) => cs.flatMap(referencedIntrinsics).toSet
    case OrCondition(cs)  => cs.flatMap(referencedIntrinsics).toSet
    case MapCondition(es) => es.values.flatMap(referencedIntrinsics).toSet
    case _                => Set.empty
  }

  def intrinsicValue(name: String, in: IntrinsicsView): JValue = name match {
    case Intrinsic.Id            => in.jId
    case Intrinsic.Table         => in.jTable
    case Intrinsic.Signature     => JString(in.signature)
    case Intrinsic.Deleted       => if (in.deleted) JValue.JTrue else JValue.JFalse
    case Intrinsic.FirstUpdateAt => if (in.firstUpdateAt == null) JNull else JString(in.firstUpdateAt)
    case Intrinsic.LastUpdateAt  => if (in.lastUpdateAt == null) JNull else JString(in.lastUpdateAt)
    case Intrinsic.LastMutateAt  => if (in.lastMutateAt == null) JNull else JString(in.lastMutateAt)
    case Intrinsic.Placement     => in.jPlacement
    case Intrinsic.Version =>
      throw new UnsupportedOperationException("~version is not supported in conditions (by design)")
    case other => throw new UnsupportedOperationException(other)
  }
}

/** Intrinsic pseudo-column names (sor-api/.../api/Intrinsic.java:15-27). */
object Intrinsic {
  val Id = "~id"
  val Table = "~table"
  val Version = "~version"
  val Signature = "~signature"
  val Deleted = "~deleted"
  val FirstUpdateAt = "~firstUpdateAt"
  val LastUpdateAt = "~lastUpdateAt"
  val LastMutateAt = "~lastMutateAt"
  val Placement = "~placement"

  val All: Seq[String] = Seq(Id, Table, Version, Signature, Deleted,
    FirstUpdateAt, LastUpdateAt, LastMutateAt, Placement)
}
