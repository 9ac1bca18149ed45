package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Claim-based event delivery as a queryable relational surface (SURVEY
 * §2.9; reference databus-api Databus.java:59-91 — poll claims, renew,
 * acknowledge, unclaimAll, getClaimCount).
 *
 * A channel is a DataFrame of pending events per subscription:
 * (subscription: string, msg_id: long in changeId order, claim_until_ms:
 * long, plus payload columns). A row is CLAIMED at instant `now` iff
 * `claim_until_ms > now`; an expired claim lapses back to pollable with no
 * separate state transition — exactly the reference's TTL semantics, where
 * an un-acked event re-delivers after its claim expires.
 *
 * Scale notes: every operator here is one hash shuffle on `subscription`
 * (or none). `claim` needs per-subscription ordering, which is inherent to
 * the semantics (ordered delivery within a channel) — the window partitions
 * by subscription, so N subscriptions parallelize across the cluster while
 * each channel stays sequential, the same concurrency shape as the
 * reference's per-subscription dedup queues.
 */
object Claims {

  /** Claim up to `limit` unclaimed-or-lapsed events per subscription, in
    * msg_id (changeId) order: their `claim_until_ms` becomes
    * `nowMs + claimTtlMs`. Already-claimed rows are untouched — polling
    * never extends or steals a live claim (Databus.java poll: claimed
    * events are skipped until their TTL lapses). Returns the whole updated
    * channel. */
  def claim(channel: DataFrame, nowMs: Long, claimTtlMs: Long, limit: Int): DataFrame = {
    // ONE scan + one shuffle: the window partitions by (subscription,
    // lapsed?) so lapsed rows number independently of live ones — no
    // filter/union split reading the channel twice. Live rows get a rank
    // too, but the claim predicate ignores it.
    val lapsed = col("claim_until_ms") <= nowMs
    val w = Window.partitionBy(col("subscription"), lapsed).orderBy("msg_id")
    channel
      .withColumn("__rn", row_number().over(w))
      .withColumn("claim_until_ms",
        when(lapsed && col("__rn") <= limit, lit(nowMs + claimTtlMs))
          .otherwise(col("claim_until_ms")))
      .drop("__rn")
  }

  /** The claimed batch a poll at `nowMs` would hand the consumer: the rows
    * whose claim is live. Pair with [[claim]]: `poll = claim(...) then
    * claimedBatch(...)`. */
  def claimedBatch(channel: DataFrame, subscription: String, nowMs: Long): DataFrame =
    channel.where(col("subscription") === subscription && col("claim_until_ms") > nowMs)

  /** Peek: the batch a poll would deliver, WITHOUT claiming anything
    * (Databus.java peek) — unclaimed-or-lapsed events in msg_id order. */
  def peek(channel: DataFrame, subscription: String, nowMs: Long, limit: Int): DataFrame =
    channel.where(col("subscription") === subscription &&
        col("claim_until_ms") <= nowMs)
      .orderBy("msg_id").limit(limit)

  /** Renew claims of one subscription (Databus.java renew → event-store
    * renew with `extendOnly=true`, DefaultClaimSet.renewAll): the new
    * expiry is `max(current, nowMs + claimTtlMs)` — renewing never
    * SHORTENS a live claim. The by-event-key form (`msgIds` given)
    * re-claims even lapsed events, exactly like the reference, where
    * renewAll installs a claim whether or not one is live
    * (DefaultClaimSetTest.testRenewExpiredClaim); the bulk keep-alive form
    * (no ids) extends only currently-live claims. */
  def renew(channel: DataFrame, subscription: String, nowMs: Long,
            claimTtlMs: Long, msgIds: Option[Seq[Long]] = None): DataFrame = {
    val targeted = msgIds match {
      case Some(ids) => col("subscription") === subscription &&
        col("msg_id").isin(ids: _*)
      case None => col("subscription") === subscription &&
        col("claim_until_ms") > nowMs
    }
    channel.withColumn("claim_until_ms",
      when(targeted, greatest(col("claim_until_ms"), lit(nowMs + claimTtlMs)))
        .otherwise(col("claim_until_ms")))
  }

  /** Acknowledge: remove delivered events from the channel permanently
    * (at-least-once — only an explicit ack consumes). */
  def ack(channel: DataFrame, subscription: String, msgIds: Seq[Long]): DataFrame =
    channel.where(!(col("subscription") === subscription &&
      col("msg_id").isin(msgIds: _*)))

  /** Ack by frame — the distributed form for bulk consumers: removes every
    * (subscription, msg_id) pair present in `acks` via one anti join (no
    * driver-side id list). */
  def ack(channel: DataFrame, acks: DataFrame): DataFrame =
    channel.join(acks.select("subscription", "msg_id"),
      Seq("subscription", "msg_id"), "left_anti")

  /** Release every live claim of a subscription back to pollable
    * (Databus.java unclaimAll). */
  def unclaimAll(channel: DataFrame, subscription: String): DataFrame =
    channel.withColumn("claim_until_ms",
      when(col("subscription") === subscription, lit(0L))
        .otherwise(col("claim_until_ms")))

  /** Drop every pending event of a subscription (Databus.java purge). */
  def purge(channel: DataFrame, subscription: String): DataFrame =
    channel.where(col("subscription") =!= subscription)

  /** The queryable claim-count surface (Databus.java getClaimCount): per
    * subscription, how many events are currently claimed at `nowMs`.
    * Subscriptions present in the channel with zero live claims report 0
    * (conditional sum, not a filtered count). One partial-aggregated
    * shuffle; output is one row per subscription. */
  def claimCounts(channel: DataFrame, nowMs: Long): DataFrame =
    channel.groupBy("subscription")
      .agg(sum(when(col("claim_until_ms") > nowMs, 1L).otherwise(0L))
        .cast("long").as("claim_count"))

  /** Claim counts at several instants in ONE pass (the monitoring shape:
    * "claims now vs after the next TTL window"). `instants` maps an output
    * column name to its probe time; the channel lineage is evaluated once
    * instead of once per instant. */
  def claimCountsAt(channel: DataFrame, instants: Seq[(String, Long)]): DataFrame = {
    require(instants.nonEmpty, "claimCountsAt needs at least one probe instant")
    channel.groupBy("subscription")
      .agg(instants.head match { case (name, t) =>
        sum(when(col("claim_until_ms") > t, 1L).otherwise(0L)).cast("long").as(name)
      }, instants.tail.map { case (name, t) =>
        sum(when(col("claim_until_ms") > t, 1L).otherwise(0L)).cast("long").as(name)
      }: _*)
  }
}
