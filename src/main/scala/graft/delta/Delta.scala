package graft.delta

import graft.condition.{Condition, ConditionEvaluator, IntrinsicsView}
import graft.json._

/**
 * The delta DSL — the engine's UPDATE language (7 node types).
 * A delta maps (old JSON value or UNDEFINED) -> (new JSON value or UNDEFINED).
 *
 * AST shape per sor-api delta package; application semantics in [[DeltaEvaluator]]
 * per sor-api/.../delta/eval/DeltaEvaluator.java.
 */
sealed trait Delta extends Serializable {
  override def toString: String = DeltaPrinter.print(this)

  /** True when evaluating this delta can read intrinsic values (conditional
    * deltas with intrinsic()/partition() tests). The resolve fold skips
    * building the per-change intrinsics view for the common false case. */
  lazy val needsIntrinsics: Boolean = this match {
    case ConditionalDelta(test, t, e) =>
      graft.condition.ConditionAlgebra.referencesIntrinsics(test) ||
        t.needsIntrinsics || e.needsIntrinsics
    case MapDelta(entries, _, _) => entries.values.exists(_.needsIntrinsics)
    case _ => false
  }

  /** Constant deltas produce the same output for every input
    * (MapDeltaImpl.computeConstant / SetDeltaImpl.isConstant). */
  def isConstant: Boolean = this match {
    case DeleteDelta | _: Literal  => true
    case MapDelta(entries, removeRest, _) => removeRest && entries.values.forall(_.isConstant)
    case SetDelta(_, _, removeRest, _)    => removeRest // sets hold only literals
    case _                         => false
  }
}

/** `~` — value becomes UNDEFINED (a document delete at top level). */
case object DeleteDelta extends Delta

/** `..` — keep the old value unchanged. */
case object NoopDelta extends Delta

/** A JSON literal — replaces the entire value. */
final case class Literal(value: JValue) extends Delta

/**
 * `{..,"k":delta}` — per-key sub-deltas. removeRest (`{}` form) drops keys
 * not listed; deleteIfEmpty (trailing `?`) turns an empty result into
 * UNDEFINED.
 */
final case class MapDelta(
    entries: Map[String, Delta],
    removeRest: Boolean,
    deleteIfEmpty: Boolean) extends Delta

/**
 * `(..,"a",~"b")` — treat a JSON list as a sorted set: add/remove literal
 * values; without `..` (removeRest) the set is replaced by the added values.
 * Result is sorted by the cross-type literal ordering.
 */
final case class SetDelta(
    added: Set[JValue],
    removed: Set[JValue],
    removeRest: Boolean,
    deleteIfEmpty: Boolean) extends Delta

/** `if <cond> then <delta> [elif ...] [else <delta>] end` — CAS on current value. */
final case class ConditionalDelta(test: Condition, thenDelta: Delta, elseDelta: Delta) extends Delta

object Deltas {
  val delete: Delta = DeleteDelta
  val noop: Delta = NoopDelta
  def literal(v: JValue): Delta = Literal(v)

  def conditional(test: Condition, thenDelta: Delta, elseDelta: Delta = NoopDelta): Delta =
    test match {
      // constant-test folding (Deltas.java:52-57)
      case graft.condition.ConstantCondition(true)  => thenDelta
      case graft.condition.ConstantCondition(false) => elseDelta
      case _ => ConditionalDelta(test, thenDelta, elseDelta)
    }

  def mapDelta(entries: (String, Delta)*): Delta =
    MapDelta(entries.toMap, removeRest = false, deleteIfEmpty = false)

  /** True when the delta can never evaluate to UNDEFINED
    * (MapDeltaBuilderImpl.NeverDeletePredicate). */
  def neverDeletes(d: Delta): Boolean = d match {
    case _: Literal           => true
    case NoopDelta            => false
    case DeleteDelta          => false
    case MapDelta(_, _, die)  => !die
    case SetDelta(_, _, _, die) => !die
    case ConditionalDelta(_, t, e) => neverDeletes(t) && neverDeletes(e)
  }

  /** Build-time normalization of a map delta (MapDeltaBuilderImpl.build):
    * deleteIfEmpty is dropped when some entry can never delete; a constant
    * map delta collapses to the literal (or delete) it always produces. */
  def buildMap(entries: Map[String, Delta], removeRest: Boolean, deleteIfEmpty: Boolean): Delta = {
    val die = deleteIfEmpty && !(entries.nonEmpty && entries.values.exists(neverDeletes))
    val d = MapDelta(entries, removeRest, die)
    if (d.isConstant) evalAsConstant(d) else d
  }

  private def evalAsConstant(d: Delta): Delta =
    DeltaEvaluator.eval(d, JUndefined) match {
      case JUndefined => DeleteDelta
      case v          => Literal(v)
    }

  /** Intrinsic data fields + `~tags`: keys a producer may never write
    * (Intrinsic.DATA_FIELDS + UpdateRef.TAGS_NAME). */
  private val protectedKeys: Set[String] = {
    import graft.condition.Intrinsic
    Set(Intrinsic.Id, Intrinsic.Table, Intrinsic.Version, Intrinsic.Signature,
      Intrinsic.Deleted, Intrinsic.FirstUpdateAt, Intrinsic.LastUpdateAt,
      Intrinsic.LastMutateAt, Intrinsic.Placement, "~tags")
  }

  /** Write-path delta sanitization (DefaultDataStore.update →
    * SanitizeDeltaVisitor): a top-level value in the store must be a JSON
    * object, so literal scalars/lists and top-level set-deltas are
    * rejected; intrinsic data fields and `~tags` are silently stripped
    * from top-level literal objects and map-delta entries, recursing
    * through conditional branches. Nested values keep their keys — only
    * the document's top level is protected. */
  def sanitize(d: Delta): Delta = d match {
    case NoopDelta | DeleteDelta => d
    case Literal(JObj(fields)) => Literal(JObj(fields -- protectedKeys))
    case Literal(_) => throw new IllegalArgumentException(
      "Top-level values in the System of Record must be JSON objects.")
    case MapDelta(entries, removeRest, deleteIfEmpty) =>
      MapDelta(entries -- protectedKeys, removeRest, deleteIfEmpty)
    case _: SetDelta => throw new IllegalArgumentException(
      "Top-level values in the System of Record must be JSON objects.")
    case ConditionalDelta(test, t, e) =>
      ConditionalDelta(test, sanitize(t), sanitize(e))
  }

  def fromString(text: String): Delta = DslParser.parseDelta(text)

  /** Parse a newline/whitespace-separated stream of delta expressions
    * (DeltaParser.parseStream / DeltaStreamSplitter analog): splits at
    * top-level boundaries, respecting strings and nesting. */
  def parseStream(text: String): Iterator[Delta] = {
    val out = Vector.newBuilder[Delta]
    val t = new graft.json.Tokener(text)
    while (t.lookAhead() != 0) {
      out += new DslParser(t).parseDelta()
    }
    out.result().iterator
  }
}

/** Applies deltas. Parity: sor-api/.../delta/eval/DeltaEvaluator.java. */
object DeltaEvaluator {

  def eval(delta: Delta, json: JValue): JValue = eval(delta, json, null)

  def eval(delta: Delta, json: JValue, intrinsics: IntrinsicsView): JValue = delta match {
    case DeleteDelta => JUndefined
    case NoopDelta   => json
    case Literal(v)  => v

    case MapDelta(entries, removeRest, deleteIfEmpty) =>
      val result = Map.newBuilder[String, JValue]
      var size = 0
      def put(k: String, v: JValue): Unit =
        if (v ne JUndefined) { result += (k -> v); size += 1 }
      json match {
        case JObj(old) =>
          // old keys: apply sub-delta if present, else keep unless removeRest
          old.foreach { case (k, oldValue) =>
            entries.get(k) match {
              case Some(d) => put(k, eval(d, oldValue, intrinsics))
              case None    => if (!removeRest) put(k, oldValue)
            }
          }
          // new keys
          entries.foreach { case (k, d) =>
            if (!old.contains(k)) put(k, eval(d, JUndefined, intrinsics))
          }
        case _ =>
          // no source map: build from entries applied to UNDEFINED
          entries.foreach { case (k, d) => put(k, eval(d, JUndefined, intrinsics)) }
      }
      if (deleteIfEmpty && size == 0) JUndefined else JObj(result.result())

    case SetDelta(added, removed, removeRest, deleteIfEmpty) =>
      val resultSet = scala.collection.mutable.TreeSet.empty[JValue](JValue.CrossTypeOrdering)
      json match {
        case JArr(existing) if !removeRest =>
          resultSet ++= added
          existing.foreach { v => if (!removed.contains(v)) resultSet += v }
        case _ =>
          // undefined, not a list, or removeRest: set = added values only
          resultSet ++= added
      }
      if (deleteIfEmpty && resultSet.isEmpty) JUndefined
      else JArr(resultSet.toVector)

    case ConditionalDelta(test, thenDelta, elseDelta) =>
      val branch = if (ConditionEvaluator.eval(test, json, intrinsics)) thenDelta else elseDelta
      eval(branch, json, intrinsics)
  }
}
