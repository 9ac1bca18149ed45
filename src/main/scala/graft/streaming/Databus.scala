package graft.streaming

import graft.condition.{Condition, Conditions, ConditionEvaluator, IntrinsicsView}
import graft.json._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass multi-subscription matcher: evaluates EVERY subscription
 * condition against one event row and returns the array of matched
 * subscription names. The subscription list rides in the expression (plan
 * broadcast — serialized once per executor, conditions parsed lazily per
 * JVM), so fanout over N subscriptions is ONE scan of the event batch
 * regardless of N — the DefaultFanout.java:195-260 shape, where each event
 * is read once and tested against the whole subscription set.
 *
 * `subs` entries are (name, conditionText, minMs): an event matches entry i
 * iff `ms >= minMs(i)` (event-TTL cutoff; Long.MinValue = no cutoff) and the
 * condition accepts the event's (attrs, tags, table, key).
 *
 * children: attrsJson (string, nullable), tags (array<string>), table, key,
 * ms (long), placement (string, nullable — the ~placement intrinsic, one of
 * the three intrinsics available at fanout per SubscriptionIntrinsics.java).
 *
 * A condition that throws during evaluation (e.g. referencing an intrinsic
 * unavailable at fanout, like ~signature) does NOT match — the reference
 * logs and skips (SubscriptionEvaluator.java:88-92) rather than failing the
 * fanout pass.
 */
case class MultiSubscriptionMatch(subs: Seq[(String, String, Long)],
                                  children: Seq[Expression])
    extends Expression with CodegenFallback {

  /** Distinct (conditionText, minMs) pairs evaluated ONCE per row, with each
    * subscription resolving through an index — real registries repeat
    * conditions heavily (templated subscriptions), so N subscriptions cost
    * D <= N evaluations per event instead of N. Output order (and therefore
    * the exploded row order) is the subscription order, unchanged. */
  @transient private lazy val compiled: (Array[UTF8String], Array[Condition], Array[Long], Array[Int]) = {
    val names = new Array[UTF8String](subs.length)
    val subIdx = new Array[Int](subs.length)
    val keyToIdx = scala.collection.mutable.LinkedHashMap.empty[(String, Long), Int]
    var i = 0
    subs.foreach { case (n, c, m) =>
      names(i) = UTF8String.fromString(n)
      subIdx(i) = keyToIdx.getOrElseUpdate((c, m), keyToIdx.size)
      i += 1
    }
    val conds = new Array[Condition](keyToIdx.size)
    val mins = new Array[Long](keyToIdx.size)
    keyToIdx.foreach { case ((c, m), j) =>
      conds(j) = Conditions.fromString(c); mins(j) = m
    }
    (names, conds, mins, subIdx)
  }

  override def dataType: org.apache.spark.sql.types.DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val attrsV = children(0).eval(input)
    val tagsV = children(1).eval(input)
    val tableV = children(2).eval(input)
    val keyV = children(3).eval(input)
    val msV = children(4).eval(input)
    // unparseable attrs degrade to the empty attribute map rather than
    // failing the task: attribute-referencing conditions then see only
    // undefined fields (no match), while intrinsic/tag/alwaysTrue
    // subscriptions still deliver — the log-and-continue discipline of
    // DefaultFanout, extended to the one failure class the reference's
    // pre-parsed table metadata cannot exhibit
    val attrs: JValue =
      if (attrsV == null) JObj(Map.empty)
      else try JsonCodec.parse(attrsV.toString)
      catch { case _: Exception => JObj(Map.empty) }
    val tags: Seq[String] =
      if (tagsV == null) Seq.empty
      else {
        val ad = tagsV.asInstanceOf[ArrayData]
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
    val placementV = if (children.size > 5) children(5).eval(input) else null
    val json = Databus.eventMatchJson(attrs, tags)
    val intr = IntrinsicsView(
      if (keyV == null) null else keyV.toString,
      if (tableV == null) null else tableV.toString,
      null, deleted = false, null, null, null,
      if (placementV == null) null else placementV.toString)
    val ms = if (msV == null) Long.MaxValue else msV.asInstanceOf[Long]
    val (names, conds, mins, subIdx) = compiled
    // evaluate each DISTINCT (condition, minMs) once; exception semantics
    // are per-condition, so the memoized verdict equals the per-sub one
    val verdict = new Array[Boolean](conds.length)
    var j = 0
    while (j < conds.length) {
      verdict(j) = ms >= mins(j) &&
        (try ConditionEvaluator.eval(conds(j), json, intr)
         catch { case _: Exception => false })
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < names.length) {
      if (verdict(subIdx(i))) out += names(i)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

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
    // the ~tags pseudo-field only EXISTS when the event carries tags
    // (SubscriptionEvaluator.java:70-75 puts it conditionally), so
    // is(defined)/equal([]) on ~tags are false for untagged events
    if (tags.isEmpty) JObj(base)
    else JObj(base + ("~tags" -> JArr(tags.map(JString(_)).toVector)))
  }

  /**
   * Fanout an events DataFrame (columns: table, key, ms, seq, node, tags,
   * plus optional attrs JSON column) across subscriptions. Emits one row per
   * (matched subscription, event) with a `subscription` column — the
   * relational form of per-subscription channels.
   *
   * Two physical shapes, chosen by subscription count:
   *  - small N (<= `unionPathMaxSubs`): a UNION of one natively-compiled
   *    filter branch per subscription — predicates are Catalyst filters, so
   *    they push down and codegen; the plan is wide but each branch prunes.
   *  - large N: ONE pass over the batch via [[MultiSubscriptionMatch]] —
   *    the subscription set is evaluated per row emitting the matched-name
   *    array, then exploded. N subscriptions never means N scans; this is
   *    the shape that survives the reference's real cardinality (hundreds of
   *    standing subscriptions, DefaultFanout.java:195-260).
   */
  def fanout(events: DataFrame, subs: Seq[Subscription],
             attrsCol: Option[String] = None,
             unionPathMaxSubs: Int = 16,
             placementCol: Option[String] = None): DataFrame = {
    if (subs.isEmpty) // e.g. every subscription expired — nothing to deliver
      events.withColumn("subscription", lit(null).cast("string")).limit(0)
    else if (subs.size <= unionPathMaxSubs) {
      val branches = subs.map { sub =>
        events.where(matchColumn(sub, events, attrsCol, placementCol))
          .withColumn("subscription", lit(sub.name))
      }
      branches.reduce(_.unionByName(_))
    } else
      fanoutSinglePass(events, subs.map(s => (s.name, s.condition, Long.MinValue)),
        attrsCol, placementCol)
  }

  /** The large-N fanout shape: one scan, matched-subscription array, explode.
    * Empty match arrays drop the event (explode, not explode_outer) — parity
    * with the union path, which emits nothing for unmatched events. */
  private def fanoutSinglePass(events: DataFrame, subs: Seq[(String, String, Long)],
                               attrsCol: Option[String],
                               placementCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val attrs = attrsCol.map(col).getOrElse(lit(null).cast("string"))
    val placement = placementCol.map(col).getOrElse(lit(null).cast("string"))
    val matchArr = GraftBridge.column(MultiSubscriptionMatch(subs,
      Seq(attrs, col("tags"), col("table"), col("key"), col("ms").cast("long"),
        placement).map(GraftBridge.expression)))
    events.withColumn("subscription", explode(matchArr))
  }

  /** The match predicate for one subscription as a Column. Conditions that
    * only reference `~tags` and intrinsics (the common case) compile to
    * native Catalyst predicates — pushdown + codegen; anything touching
    * table-template attributes falls back to the parity evaluator. */
  def matchColumn(sub: Subscription, events: DataFrame, attrsCol: Option[String],
                  placementCol: Option[String] = None): Column =
    // UnsupportedOperationException = "not natively compilable" (e.g. a
    // comparison literal crossing the UTF-8/UTF-16 order divergence):
    // fall back to the exact parity UDF rather than failing the fanout
    (try tryCompileNative(sub.parsed, placementCol)
     catch { case _: UnsupportedOperationException => None }).getOrElse {
      val attrs = attrsCol.map(col).getOrElse(lit(null).cast("string"))
      val placement = placementCol.map(col).getOrElse(lit(null).cast("string"))
      matchUdf(sub.condition)(attrs, col("tags"), col("table"), col("key"), placement)
    }

  import graft.condition._
  import graft.engine.ConditionCompiler
  import org.apache.spark.sql.types.{ArrayType, StringType}

  // private[streaming]: NativeCompileCoverageSpec pins the per-node-type
  // compiled/fallback matrix over the conformance corpus — a regression
  // demoting a common shape to the parity UDF costs ~10x on fanout while
  // passing every correctness gate, so coverage itself is gated
  private[streaming] def tryCompileNative(cond: Condition,
                               placementCol: Option[String] = None): Option[Column] = cond match {
    case ConstantCondition(b) => Some(lit(b))
    case MapCondition(entries) if entries.keySet.subsetOf(Set("~tags")) =>
      // ~tags is ABSENT (undefined), not empty, for an untagged event —
      // null-out empty arrays and compile in null-means-absent mode so
      // is(defined)/equal([]) agree with the parity evaluator
      Some(entries.get("~tags")
        .map { sub =>
          val tagsOrAbsent = when(col("tags").isNull || size(col("tags")) === 0,
            lit(null).cast(ArrayType(StringType))).otherwise(col("tags"))
          ConditionCompiler.compileField(sub, tagsOrAbsent, ArrayType(StringType),
            mayBeUndefined = true)
        }
        .getOrElse(lit(true)))
    case IntrinsicCondition(name, sub) =>
      val target = name match {
        case Intrinsic.Table     => Some(col("table"))
        case Intrinsic.Id        => Some(col("key"))
        case Intrinsic.Placement => placementCol.map(col)
        case _                   => None
      }
      target.map(c => ConditionCompiler.compileField(sub, c, StringType))
    case AndCondition(cs) =>
      val parts = cs.map(tryCompileNative(_, placementCol))
      if (parts.forall(_.isDefined)) Some(parts.flatten.reduce(_ && _)) else None
    case OrCondition(cs) =>
      val parts = cs.map(tryCompileNative(_, placementCol))
      if (parts.forall(_.isDefined)) Some(parts.flatten.reduce(_ || _)) else None
    case NotCondition(c) =>
      // null-coalesce under NOT (parity with ConditionCompiler and the UDF
      // path): for e.g. not({..,"~tags":containsAny(..)}) on a null tags
      // column, arrays_overlap yields SQL NULL and !NULL would stay NULL,
      // silently dropping an event the condition semantics deliver
      tryCompileNative(c, placementCol).map(inner => !coalesce(inner, lit(false)))
    case _ => None
  }

  private def matchUdf(condText: String) = {
    val cond = Conditions.fromString(condText)
    udf((attrsJson: String, tags: Seq[String], table: String, key: String,
         placement: String) => {
      // same corrupt-attrs degradation as MultiSubscriptionMatch.eval
      val attrs =
        if (attrsJson == null) JObj(Map.empty)
        else try JsonCodec.parse(attrsJson)
        catch { case _: Exception => JObj(Map.empty) }
      val json = eventMatchJson(attrs, if (tags == null) Seq.empty else tags)
      val intr = IntrinsicsView(key, table, null, deleted = false, null, null, null,
        placement)
      // a condition that cannot be evaluated at fanout does not match
      // (SubscriptionEvaluator.java:88-92 logs and returns false)
      try ConditionEvaluator.eval(cond, json, intr)
      catch { case _: Exception => false }
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

  /** Orphan handling at fanout (DefaultFanout.java:222-244,
    * DefaultFanoutTest.testFanoutToDroppedTable): an event whose table the
    * catalog does not know is NOT fanned out — it retries until the grace
    * period from its change time passes (covering the race between a
    * create and table-cache invalidation, so events to brand-new tables
    * deliver once the catalog catches up), then drops. Returns (routable,
    * retry, drop); feed `retry` back into the next batch and discard
    * `drop`. The catalog side is tiny — the semi/anti joins broadcast. */
  def splitOrphans(events: DataFrame, knownTables: DataFrame, nowMs: Long,
                   graceMs: Long = 30000L): (DataFrame, DataFrame, DataFrame) = {
    val known = broadcast(knownTables.select(col("table")).distinct())
    val routable = events.join(known, Seq("table"), "left_semi")
    val orphans = events.join(known, Seq("table"), "left_anti")
    (routable,
      orphans.where(col("ms") >= nowMs - graceMs),
      orphans.where(col("ms") < nowMs - graceMs))
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
    * it is broadcast with the compiled predicates.
    *
    * `defaultJoinFilter` reproduces DefaultDatabus.java:342-366: when the
    * installation-wide default condition is set (not alwaysTrue), it is
    * AND-ed onto the caller's condition AT SUBSCRIBE TIME — an alwaysTrue
    * user condition is replaced outright. Callers that must see every event
    * (the canary, internal tooling) opt out via
    * `includeDefaultJoinFilter = false`. */
  def subscribe(registry: Seq[SubscriptionRecord], name: String, condition: String,
                nowMs: Long, subscriptionTtlMs: Long, eventTtlMs: Long,
                defaultJoinFilter: Option[String] = None,
                includeDefaultJoinFilter: Boolean = true): Seq[SubscriptionRecord] = {
    require(graft.engine.Names.isLegalSubscriptionName(name),
      s"Subscription name must be a lowercase ASCII string, 1-255 characters: $name")
    val effective = defaultJoinFilter.filter(_ => includeDefaultJoinFilter) match {
      case None => condition
      case Some(d) =>
        val dc = Conditions.fromString(d)
        if (dc == ConstantCondition(true)) condition
        else {
          val uc = Conditions.fromString(condition)
          if (uc == ConstantCondition(true)) dc.toString
          else Conditions.and(Seq(uc, dc)).toString
        }
    }
    registry.filterNot(_.name == name) :+
      SubscriptionRecord(name, effective, nowMs + subscriptionTtlMs, eventTtlMs)
  }

  /** Move pending events from one subscription's channel to another
    * (Databus.java:114-125 moveAsync): re-keys every un-acked row of `from`
    * to `to` WITHOUT re-running the destination's condition — the
    * reference explicitly does not filter by the destination's table
    * filter — and leaves future fanout unaffected (the registry still
    * routes new events by each subscription's own condition). A pure
    * column rewrite: no shuffle, no re-evaluation. */
  def move(channel: DataFrame, from: String, to: String): DataFrame =
    channel.withColumn("subscription",
      when(col("subscription") === from, lit(to)).otherwise(col("subscription")))

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
    * and each subscription sees only events within its event TTL. Large
    * registries take the single-pass path with per-subscription TTL cutoffs
    * folded into the match expression. */
  def fanoutWithTtl(events: DataFrame, registry: Seq[SubscriptionRecord],
                    nowMs: Long, attrsCol: Option[String] = None,
                    unionPathMaxSubs: Int = 16): DataFrame = {
    val live = registry.filter(_.subscriptionExpiresMs > nowMs)
    if (live.isEmpty)
      events.withColumn("subscription", lit(null).cast("string")).limit(0)
    else if (live.size <= unionPathMaxSubs) {
      val branches = live.map { r =>
        events.where(col("ms") >= nowMs - r.eventTtlMs &&
            matchColumn(Subscription(r.name, r.condition), events, attrsCol))
          .withColumn("subscription", lit(r.name))
      }
      branches.reduce(_.unionByName(_))
    } else
      fanoutSinglePass(events,
        live.map(r => (r.name, r.condition, nowMs - r.eventTtlMs)), attrsCol)
  }

  // ------------------------------------------- cross-DC replication routing

  /** System channel names (databus/ChannelNames.java:29-35). */
  def masterChannel(partition: Int): String = s"__system_bus:master[$partition]"
  def replicationChannel(dc: String, partition: Int): String =
    s"__system_bus:out:$dc[$partition]"

  /** HashingPartitionSelector parity: abs(murmur3_32(utf8(key))) % n with
    * Java int-abs semantics; a null key routes to partition 0
    * (PartitionSelector.java:17-19). */
  def partitionFor(key: String, numPartitions: Int): Int =
    if (key == null) 0 else Math.abs(graft.json.Hashes.murmur3_32(key)) % numPartitions

  private def partitionColumn(key: Column, numPartitions: Int): Column = {
    // Java-abs guard: Spark's checked abs throws on Int.MinValue under
    // ANSI; Math.abs (the partitionFor parity target) returns it unchanged
    val h = graft.engine.expressions.emoHash32(key)
    val absJ = when(h === Int.MinValue, lit(Int.MinValue)).otherwise(abs(h))
    when(key.isNull, lit(0)).otherwise(absJ % numPartitions)
  }

  /**
   * Outbound cross-DC replication routing (DefaultFanout.java:246-258): each
   * event is copied, once per NON-local datacenter of its table, onto the
   * replication fanout channel `__system_bus:out:<dc>[<partition>]`, where
   * partition = abs(murmur3_32(key)) % outboundPartitions (the
   * HashingPartitionSelector). `tableDataCenters` is the relational form of
   * `table.getDataCenters()` (Table.java:24): one (table, datacenter) row per
   * replica — it is catalog-sized, so the join broadcasts; the event batch is
   * scanned once and never shuffles (the channel column is a pure projection).
   */
  def replicationFanout(events: DataFrame, tableDataCenters: DataFrame,
                        currentDc: String, outboundPartitions: Int = 8): DataFrame = {
    val remote = broadcast(
      tableDataCenters.where(col("datacenter") =!= currentDc)
        .select("table", "datacenter").distinct())
    events.join(remote, Seq("table"))
      .withColumn("partition", partitionColumn(col("key"), outboundPartitions))
      .withColumn("channel",
        concat(lit("__system_bus:out:"), col("datacenter"),
          lit("["), col("partition").cast("string"), lit("]")))
  }

  /** Inbound write-side partitioning (DefaultDatabus.java:400-407): events
    * land on the partitioned master fanout channel by key hash, so one
    * leader per partition fans out independently. Same hash family as the
    * outbound selector. */
  def masterChannels(events: DataFrame, masterPartitions: Int = 8): DataFrame =
    events.withColumn("partition", partitionColumn(col("key"), masterPartitions))
      .withColumn("channel",
        concat(lit("__system_bus:master["), col("partition").cast("string"), lit("]")))

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
