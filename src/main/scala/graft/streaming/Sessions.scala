package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over event streams: consecutive events of the
 * same entity belong to one session while the inter-event gap stays under
 * `gapMs`; a larger gap starts a new session. The batch analogue of
 * Structured Streaming's `session_window(ts, gap)` (same semantics:
 * a session extends while each event arrives within `gap` of the
 * previous one), pinned to a deterministic (ts, tie) total order so the
 * result is reproducible and oracle-checkable.
 *
 * Scale shape: one hash shuffle on the entity key, then per-entity
 * window functions (lag + running sum) over entity-local partitions —
 * each task sorts only its entities' events, never the global stream.
 * Per-entity volumes are bounded in practice (a user's events, a
 * device's pings); for a pathological single hot entity, pre-split by a
 * coarse time bucket first (sessions never span buckets longer than the
 * retention window) — same pattern as the salted aggregates in
 * [[graft.pipeline.Stats]].
 */
object Sessions {

  /**
   * Assign `session_idx` (0-based, per entity, in time order) to each
   * event. `tsCol` must be epoch milliseconds (long); `tieCol` breaks
   * equal-timestamp ties (any unique id) so the order — and therefore
   * the session numbering — is total and deterministic.
   */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 tieCol: String, gapMs: Long): DataFrame = {
    val order = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(order)
    df.withColumn("_brk",
        when(prev.isNull || col(tsCol) - prev > gapMs, 1L).otherwise(0L))
      // running sum over the same per-entity order; first event's brk=1
      // makes the numbering 1..k, minus 1 for a 0-based session_idx
      .withColumn("session_idx",
        sum(col("_brk")).over(order.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - 1L)
      .drop("_brk")
  }

  /**
   * Per-session rollup: event count, id bounds, duration. All-integer
   * output (oracle-safe); compose further aggregates on the sessionized
   * frame when needed.
   *
   * Output: entityCol, session_idx, n_events, first_event, last_event,
   * duration_ms.
   */
  def sessionStats(df: DataFrame, entityCol: String, tsCol: String,
                   tieCol: String, gapMs: Long): DataFrame =
    sessionize(df, entityCol, tsCol, tieCol, gapMs)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tieCol)).as("first_event"),
        max(col(tieCol)).as("last_event"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"))

  /**
   * Session rollup via Spark's NATIVE `session_window` aggregate — the
   * same stats as [[sessionStats]] computed by the engine's own
   * gap-session operator, usable identically in batch and Structured
   * Streaming (pass `watermarkDelayMs` on a stream: completed sessions
   * emit in append mode once the watermark passes session end + gap, and
   * state is bounded by OPEN sessions only — the shape that survives
   * unbounded streams, where [[sessionize]]'s lag + running-sum
   * formulation needs each entity's full history under one task).
   *
   * Semantics alignment (probed and spec-pinned in StreamingSpec,
   * including the exact-gap boundary): the native operator merges events
   * with `diff <= gap` — identical to [[sessionize]]'s `diff <= gapMs`
   * rule, so the two formulations agree with the same gap value.
   *
   * Output: entityCol, session_start_ms, n_events, first_event,
   * last_event, duration_ms — all integers (oracle-safe).
   */
  def sessionWindowStats(df: DataFrame, entityCol: String, tsCol: String,
                         tieCol: String, gapMs: Long,
                         watermarkDelayMs: Option[Long] = None): DataFrame = {
    require(!df.columns.contains("_ts") && !df.columns.contains("_w"),
      "sessionWindowStats: input must not carry the internal columns _ts/_w")
    val withTs = df.withColumn("_ts", timestamp_millis(col(tsCol)))
    val marked = watermarkDelayMs.fold(withTs)(d =>
      withTs.withWatermark("_ts", s"$d milliseconds"))
    marked
      .groupBy(col(entityCol),
        session_window(col("_ts"), s"$gapMs milliseconds").as("_w"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tieCol)).as("first_event"),
        max(col(tieCol)).as("last_event"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"))
      .select(col(entityCol),
        unix_millis(col("_w").getField("start")).as("session_start_ms"),
        col("n_events"), col("first_event"), col("last_event"), col("duration_ms"))
  }

  /**
   * Within-session transition counts — first-order Markov statistics over
   * the event-type sequence: one row per (from_type, to_type) pair of
   * consecutive same-entity events whose gap stays within `gapMs` (pass
   * `Long.MaxValue` to count across session boundaries too).
   *
   * Scale shape: the same single entity-hash shuffle + entity-local lag as
   * [[sessionize]], then a groupBy whose key domain is |event types|² —
   * the aggregate map-side-combines to a tiny result no matter the corpus
   * size.
   */
  def transitionCounts(df: DataFrame, entityCol: String, tsCol: String,
                       tieCol: String, typeCol: String, gapMs: Long): DataFrame = {
    val order = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(order)
    df.withColumn("_from", lag(col(typeCol), 1).over(order))
      .withColumn("_gap_ok", col(tsCol) - prevTs <= gapMs)
      .where(col("_from").isNotNull && col("_gap_ok"))
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Ordered funnel: how far each entity progresses through `stages` (an
   * event-type sequence), where each stage must occur STRICTLY after the
   * time the previous stage was first reached (equal-timestamp
   * transitions do not advance — strict ts keeps the semantics
   * tie-key-free and engine-portable). Returns (entityCol, depth) with
   * depth in 0..stages.length for every entity in `df`.
   *
   * Scale shape: ONE entity-hash shuffle + per-entity chained range
   * windows (one `min` layer per stage transition, all on the same
   * partitioning and ordering, so no second exchange or sort) + one
   * co-partitioned `max` aggregate. No per-entity sequence
   * materialization, no join chain: the former formulation (one bounded
   * min aggregate + two joins per stage) planned K scans of the stream
   * and 2K co-keyed joins; this is a single scan.
   *
   * EQUIVALENCE to the nested-min definition (reach_1 = min ts of
   * stage-1 events; reach_i = min ts of stage-i events with
   * ts > reach_{i-1}; depth = largest i with reach_i defined), pinned by
   * the randomized SessionsSpec test: define qual_1(e) = "e is a stage-1
   * event" and qual_i(e) = "e is a stage-i event with SOME qual_{i-1}
   * event strictly earlier". By induction, reach_i exists iff a chain
   * e_1 < ... < e_i of stage-1..i events exists iff some event is
   * qual_i: (⇐) a qual_i event e_i unwinds to such a chain; (⇒) given
   * the chain, reach_1 <= ts(e_1) < ts(e_2) so e_2 qualifies and
   * reach_2 <= ts(e_2), and so on. "Some qual_{i-1} strictly earlier" is
   * exactly `min(qual_{i-1} ts) over RANGE (-inf, -1]` being non-null —
   * the range frame bounds by the ts VALUE, so equal-timestamp events
   * are excluded (strict-ts advancement, tie-key-free), and a null-ts
   * qual event contributes a null to the min (ignored), matching the
   * nested min's null comparison semantics.
   */
  def funnelDepth(df: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // the RANGE (-inf, ts-1] frame encodes "strictly earlier" EXACTLY only
    // for integral timestamps (ts-1 excludes equal, includes everything
    // below); a fractional ts at distance <1 would be silently missed, and
    // a TimestampType column fails range-frame analysis — fail loud
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"funnelDepth requires an integral epoch-ms timestamp column, got $other")
    }
    val strictlyBefore = Window.partitionBy(entityCol).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    var cur = df.withColumn("_q1", col(typeCol) === stages.head)
    for (i <- 2 to stages.length)
      cur = cur.withColumn(s"_q$i",
        col(typeCol) === stages(i - 1) &&
          min(when(col(s"_q${i - 1}"), col(tsCol))).over(strictlyBefore).isNotNull)
    // highest qualifying stage wins per row (stages may repeat a type, so
    // one row can be qual_i for several i)
    val rowDepth = (1 to stages.length).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_q$i"), lit(i)).otherwise(acc)
    }
    cur.groupBy(col(entityCol)).agg(max(rowDepth).as("depth"))
  }

  /** Streaming formulation of the same sessions: Structured Streaming's
    * built-in session window (gap semantics identical to [[sessionize]]).
    * Use on a `readStream` frame with a watermark on `tsCol`; tested for
    * batch parity in StreamingSpec. */
  def sessionWindowAgg(df: DataFrame, entityCol: String, tsCol: Column,
                       gap: String): DataFrame =
    df.groupBy(col(entityCol), session_window(tsCol, gap))
      .agg(count(lit(1)).as("n_events"))

  /**
   * Retention cohorts — the classic product-analytics triangle: users are
   * cohorted by the period (e.g. week) of their FIRST event; retention at
   * offset k = how many of them were active k periods later. All-integer
   * (`period = ts DIV periodMs`), so the triangle is oracle-exact.
   *
   * Output: (cohort, offset, n_users) — cohort in period units since
   * epoch, offset >= 0, n_users = distinct entities from `cohort` active
   * in `cohort + offset`.
   *
   * Scale shape: ONE entity-keyed aggregate computes the first period AND
   * the distinct-period set per entity in the same pass (the former
   * {min aggregate + (entity, period) distinct + entity join} shape paid
   * two scans and three exchanges for the same information); the set is
   * bounded by the CALENDAR — |periods| = time-span / periodMs,
   * independent of corpus size (10 years of weeks is ~520 entries) — and
   * the aggregate map-side-combines, so shuffle bytes per entity are the
   * distinct periods seen per map partition. The triangle rollup is keyed
   * by (cohort, offset), cardinality periods² — tiny. No windows, nothing
   * corpus-sized in one partition.
   */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
                       periodMs: Long): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive: $periodMs")
    val period = expr(s"$tsCol DIV $periodMs")
    // collect_set drops nulls, but a null ts (null period) must still
    // produce the (entity, null) activity row the former distinct-then-join
    // formulation emitted — re-append one null when the entity had any
    val perEntity = df.groupBy(col(entityCol).as("entity"))
      .agg(min(period).as("cohort"), collect_set(period).as("ps"),
        (count(lit(1)) > count(period)).as("had_null_p"))
    perEntity
      .select(col("cohort"),
        explode(when(col("had_null_p"),
            concat(col("ps"), array(lit(null).cast("long"))))
          .otherwise(col("ps"))).as("p"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))  // periods deduped per entity upstream
  }

  /**
   * Per-event rolling features over a trailing time window — the standard
   * feature-engineering shape (activity velocity at each event): for every
   * event, the entity's event count and per-`matchType` count in the
   * trailing `windowMs` (inclusive of the current instant). RANGE windows
   * bound by the VALUE of the timestamp, so simultaneous events see each
   * other symmetrically — deterministic under any partitioning, no
   * row-order tie ambiguity.
   *
   * Scale shape: one entity-keyed shuffle + per-entity sort; window state
   * is the trailing frame only. Entities are the natural key (bounded
   * per-entity history) — this never funnels the corpus through one
   * reducer the way a global-window rank would.
   */
  def rollingCounts(df: DataFrame, entityCol: String, tsCol: String,
                    typeCol: String, matchType: String,
                    windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
      .rangeBetween(-windowMs, 0)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("n_match_window",
        sum(when(col(typeCol) === matchType, 1L).otherwise(0L)).over(w))
  }
}
