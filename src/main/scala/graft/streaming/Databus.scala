package graft.streaming

import graft.condition.{Conditions, ConditionEvaluator, IntrinsicsView}
import graft.json._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A standing subscription: named condition over table attributes, intrinsics
  * and event tags (Databus.java:15-30). */
final case class Subscription(name: String, condition: String) {
  @transient lazy val parsed: graft.condition.Condition = Conditions.fromString(condition)
}

/**
 * Databus semantics as DataFrame/stream transformations (SURVEY §2.5, §2.9):
 *
 *  - fanout: event stream x subscriptions nested-loop theta-join. Small
 *    subscription lists compile to a UNION of natively-filtered branches
 *    (each branch's predicate is a Catalyst filter => pushdown + codegen);
 *    the general path is a broadcast cross-join + parity condition eval.
 *  - consolidation: N events per coordinate collapse to one (max-version
 *    content, sorted tag union) — DefaultDatabus.java:1126-1233.
 *
 * Both work identically on a batch DataFrame and on a streaming micro-batch.
 */
object Databus {

  /** The JSON value a subscription condition evaluates against for an event:
    * the table template attributes plus the event's `~tags` pseudo-field
    * (UpdateRef.java:18, SubscriptionEvaluator.java:61-87). */
  def eventMatchJson(tableAttrs: JValue, tags: Seq[String]): JValue = {
    val base = tableAttrs match {
      case JObj(fields) => fields
      case _            => Map.empty[String, JValue]
    }
    JObj(base + ("~tags" -> JArr(tags.map(JString(_)).toVector)))
  }

  /**
   * Fanout an events DataFrame (columns: table, key, ms, seq, node, tags,
   * plus optional attrs JSON column) across subscriptions. Emits one row per
   * (matched subscription, event) with a `subscription` column — the
   * relational form of per-subscription channels.
   */
  def fanout(events: DataFrame, subs: Seq[Subscription],
             attrsCol: Option[String] = None): DataFrame = {
    val branches = subs.map { sub =>
      events.where(matchColumn(sub, events, attrsCol))
        .withColumn("subscription", lit(sub.name))
    }
    branches.reduce(_.unionByName(_))
  }

  /** The match predicate for one subscription as a Column. Conditions that
    * only reference `~tags` and intrinsics (the common case) compile to
    * native Catalyst predicates — pushdown + codegen; anything touching
    * table-template attributes falls back to the parity evaluator. */
  def matchColumn(sub: Subscription, events: DataFrame, attrsCol: Option[String]): Column =
    tryCompileNative(sub.parsed).getOrElse {
      val attrs = attrsCol.map(col).getOrElse(lit(null).cast("string"))
      matchUdf(sub.condition)(attrs, col("tags"), col("table"), col("key"))
    }

  import graft.condition._
  import graft.engine.ConditionCompiler
  import org.apache.spark.sql.types.{ArrayType, StringType}

  private def tryCompileNative(cond: Condition): Option[Column] = cond match {
    case ConstantCondition(b) => Some(lit(b))
    case MapCondition(entries) if entries.keySet.subsetOf(Set("~tags")) =>
      Some(entries.get("~tags")
        .map(sub => ConditionCompiler.compileField(sub, col("tags"), ArrayType(StringType)))
        .getOrElse(lit(true)))
    case IntrinsicCondition(name, sub) =>
      val target = name match {
        case Intrinsic.Table => Some(col("table"))
        case Intrinsic.Id    => Some(col("key"))
        case _               => None
      }
      target.map(c => ConditionCompiler.compileField(sub, c, StringType))
    case AndCondition(cs) =>
      val parts = cs.map(tryCompileNative)
      if (parts.forall(_.isDefined)) Some(parts.flatten.reduce(_ && _)) else None
    case OrCondition(cs) =>
      val parts = cs.map(tryCompileNative)
      if (parts.forall(_.isDefined)) Some(parts.flatten.reduce(_ || _)) else None
    case NotCondition(c) =>
      // null-coalesce under NOT (parity with ConditionCompiler and the UDF
      // path): for e.g. not({..,"~tags":containsAny(..)}) on a null tags
      // column, arrays_overlap yields SQL NULL and !NULL would stay NULL,
      // silently dropping an event the condition semantics deliver
      tryCompileNative(c).map(inner => !coalesce(inner, lit(false)))
    case _ => None
  }

  private def matchUdf(condText: String) = {
    val cond = Conditions.fromString(condText)
    udf((attrsJson: String, tags: Seq[String], table: String, key: String) => {
      val attrs = if (attrsJson == null) JObj(Map.empty) else JsonCodec.parse(attrsJson)
      val json = eventMatchJson(attrs, if (tags == null) Seq.empty else tags)
      val intr = IntrinsicsView(key, table, null, deleted = false, null, null, null, null)
      ConditionEvaluator.eval(cond, json, intr)
    })
  }

  /** Streaming lag/liveness monitor (FanoutLagMonitor analog): a query
    * listener accumulating per-batch input rows and processing rates;
    * attach with `spark.streams.addListener(monitor)`. */
  final class LagMonitor extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile var batches: Long = 0L
    @volatile var totalInputRows: Long = 0L
    @volatile var lastBatchMs: Double = 0.0
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      batches += 1
      totalInputRows += e.progress.numInputRows
      lastBatchMs = Option(e.progress.durationMs.get("triggerExecution"))
        .map(_.doubleValue).getOrElse(0.0)
    }
  }

  /** Replay (Databus.java:94-112): re-deliver events from a timestamp
    * horizon through the same fanout — the batch analog of restarting a
    * stream from `startingOffsetsByTimestamp`. */
  def replay(events: DataFrame, subs: Seq[Subscription], sinceMs: Long,
             attrsCol: Option[String] = None): DataFrame =
    fanout(events.where(col("ms") >= sinceMs), subs, attrsCol)

  /** Canary (databus/.../core/Canary.java): a built-in alwaysTrue
    * subscription exercising the full fanout path; its event count is the
    * liveness metric. */
  def canary(events: DataFrame): DataFrame =
    fanout(events, Seq(Subscription("__canary", "alwaysTrue()")))
      .groupBy("subscription").agg(count(lit(1)).as("events_seen"))

  // ------------------------------------------------- subscription lifecycle

  /** A registered subscription with its TTL pair (Databus.java:15-43):
    * the subscription itself expires at `subscriptionExpiresMs` unless
    * renewed, and events older than `eventTtlMs` are not retained for it. */
  final case class SubscriptionRecord(name: String, condition: String,
      subscriptionExpiresMs: Long, eventTtlMs: Long)

  /** Subscribe-or-renew: same-name re-subscription replaces the condition
    * and extends the expiry (the reference's subscribe is idempotent). The
    * registry is driver-side state (ZK/C* in the reference); at fanout time
    * it is broadcast with the compiled predicates. */
  def subscribe(registry: Seq[SubscriptionRecord], name: String, condition: String,
                nowMs: Long, subscriptionTtlMs: Long, eventTtlMs: Long): Seq[SubscriptionRecord] =
    registry.filterNot(_.name == name) :+
      SubscriptionRecord(name, condition, nowMs + subscriptionTtlMs, eventTtlMs)

  def renew(registry: Seq[SubscriptionRecord], name: String,
            nowMs: Long, subscriptionTtlMs: Long): Seq[SubscriptionRecord] =
    registry.map(r => if (r.name == name)
      r.copy(subscriptionExpiresMs = nowMs + subscriptionTtlMs) else r)

  def unsubscribe(registry: Seq[SubscriptionRecord], name: String): Seq[SubscriptionRecord] =
    registry.filterNot(_.name == name)

  /** The live subscriptions at `nowMs` (expired ones drop out of fanout). */
  def activeSubscriptions(registry: Seq[SubscriptionRecord], nowMs: Long): Seq[Subscription] =
    registry.filter(_.subscriptionExpiresMs > nowMs)
      .map(r => Subscription(r.name, r.condition))

  /** Fanout honoring the lifecycle: expired subscriptions receive nothing,
    * and each subscription sees only events within its event TTL. */
  def fanoutWithTtl(events: DataFrame, registry: Seq[SubscriptionRecord],
                    nowMs: Long, attrsCol: Option[String] = None): DataFrame = {
    val live = registry.filter(_.subscriptionExpiresMs > nowMs)
    val branches = live.map { r =>
      events.where(col("ms") >= nowMs - r.eventTtlMs &&
          matchColumn(Subscription(r.name, r.condition), events, attrsCol))
        .withColumn("subscription", lit(r.name))
    }
    if (branches.isEmpty)
      events.withColumn("subscription", lit(null).cast("string")).limit(0)
    else branches.reduce(_.unionByName(_))
  }

  /**
   * Consolidate events per coordinate within a batch: keep the max-changeId
   * (winning) payload column values, union + sort tags, count collapsed
   * events. `payloadCols` are taken from the winning event.
   */
  def consolidate(events: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val changeOrder = struct(col("ms"), col("seq"), col("node"))
    val winners = payloadCols.map(c => max_by(col(c), changeOrder).as(c))
    events.groupBy(col("table"), col("key"))
      .agg(winners.head, (winners.tail :+
        array_sort(array_distinct(flatten(collect_list(col("tags"))))).as("tags") :+
        count(lit(1)).as("consolidated_count")): _*)
  }
}
