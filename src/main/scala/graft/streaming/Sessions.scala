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
   * Scale shape: one bounded `min` aggregate per stage, each joined
   * co-keyed on the entity — K aggregates on the SAME hash key (exchange
   * reuse, no per-entity sequence materialization, no window over the
   * full stream). Stage frames shrink monotonically: stage i+1 only scans
   * entities that reached stage i.
   */
  def funnelDepth(df: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var depth = df.select(col(entityCol)).distinct()
      .withColumn("depth", lit(0))
    var prev: Option[DataFrame] = None
    stages.zipWithIndex.foreach { case (stage, i) =>
      val cand = df.where(col(typeCol) === stage)
        .select(col(entityCol), col(tsCol))
      val reached = (prev match {
        case None => cand
        case Some(p) => cand.join(p, entityCol).where(col(tsCol) > col("_reach"))
      }).groupBy(entityCol).agg(min(col(tsCol)).as("_reach"))
      depth = depth.join(reached.select(col(entityCol), lit(1).as("_hit")),
          Seq(entityCol), "left")
        .withColumn("depth",
          when(col("_hit").isNotNull, lit(i + 1)).otherwise(col("depth")))
        .drop("_hit")
      prev = Some(reached)
    }
    depth
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
   * Scale shape: first-event extraction is one entity-keyed min
   * aggregate; per-period activity is a distinct over (entity, period)
   * pairs (map-side combinable); the join is entity-keyed; the triangle
   * rollup is keyed by (cohort, offset) whose cardinality is periods² —
   * tiny. No windows, nothing corpus-sized in one partition.
   */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
                       periodMs: Long): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive: $periodMs")
    val period = expr(s"$tsCol DIV $periodMs")
    val first = df.groupBy(col(entityCol).as("entity"))
      .agg(min(period).as("cohort"))
    val active = df.select(col(entityCol).as("entity"), period.as("p")).distinct()
    active.join(first, Seq("entity"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))  // (entity, p) distinct upstream
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
