package graft.spark

import graft.streaming.Claims
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Claim lifecycle semantics (reference Databus.java:59-91): poll claims in
  * order up to the limit, live claims are not re-claimable, expiry lapses
  * back to pollable, renew extends only live claims, ack consumes, and
  * getClaimCount is the conditional-sum surface. */
class ClaimsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def channel(rows: (String, Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("subscription", "msg_id", "claim_until_ms")
  }

  private def snapshot(ch: DataFrame): Set[(String, Long, Long)] =
    ch.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("claim takes the first `limit` lapsed events per subscription, in order") {
    val ch = channel(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("b", 1L, 0L), ("b", 2L, 0L))
    val claimed = Claims.claim(ch, nowMs = 1000L, claimTtlMs = 500L, limit = 2)
    assert(snapshot(claimed) === Set(
      ("a", 1L, 1500L), ("a", 2L, 1500L), ("a", 3L, 0L),
      ("b", 1L, 1500L), ("b", 2L, 1500L)))
  }

  test("live claims are skipped, expired claims lapse back and re-claim") {
    // msg 1 claimed until 2000 (live at now=1000); msg 2's claim expired
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 900L), ("a", 3L, 0L))
    val claimed = Claims.claim(ch, nowMs = 1000L, claimTtlMs = 500L, limit = 1)
    // the single slot goes to the lowest lapsed msg_id (2), not the live 1
    assert(snapshot(claimed) === Set(
      ("a", 1L, 2000L), ("a", 2L, 1500L), ("a", 3L, 0L)))
  }

  test("claimedBatch returns exactly the live claims of one subscription") {
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 500L), ("b", 3L, 2000L))
    val batch = Claims.claimedBatch(ch, "a", nowMs = 1000L)
    assert(batch.select("msg_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("peek delivers the pollable batch without claiming") {
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 0L), ("a", 3L, 0L), ("b", 4L, 0L))
    val peeked = Claims.peek(ch, "a", nowMs = 1000L, limit = 1)
    assert(peeked.select("msg_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    // the channel is untouched — peek mutates nothing
    assert(snapshot(ch) === Set(("a", 1L, 2000L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("b", 4L, 0L)))
  }

  test("renew: extend-only, by-key re-claims lapsed (DefaultClaimSet parity)") {
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 900L), ("b", 3L, 2000L))
    // bulk keep-alive: live claims extend, lapsed stay lapsed
    val renewed = Claims.renew(ch, "a", nowMs = 1000L, claimTtlMs = 5000L)
    assert(snapshot(renewed) === Set(
      ("a", 1L, 6000L), ("a", 2L, 900L), ("b", 3L, 2000L)))
    // by-msg-id renew targets a subset AND re-claims an expired event
    // (renewAll installs a claim whether or not one is live)
    val targeted = Claims.renew(channel(("a", 1L, 2000L), ("a", 2L, 900L)),
      "a", nowMs = 1000L, claimTtlMs = 5000L, msgIds = Some(Seq(2L)))
    assert(snapshot(targeted) === Set(("a", 1L, 2000L), ("a", 2L, 6000L)))
    // extendOnly: a shorter renewal never shortens a longer live claim
    val shorter = Claims.renew(channel(("a", 1L, 9000L)),
      "a", nowMs = 1000L, claimTtlMs = 100L, msgIds = Some(Seq(1L)))
    assert(snapshot(shorter) === Set(("a", 1L, 9000L)))
  }

  test("ack removes, unclaimAll releases, purge drops the channel") {
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 2000L), ("b", 3L, 2000L))
    assert(snapshot(Claims.ack(ch, "a", Seq(1L))) ===
      Set(("a", 2L, 2000L), ("b", 3L, 2000L)))
    assert(snapshot(Claims.unclaimAll(ch, "a")) ===
      Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 2000L)))
    assert(snapshot(Claims.purge(ch, "a")) === Set(("b", 3L, 2000L)))
  }

  test("claimCounts: conditional sum, zero rows included, expiry visible") {
    val ch = channel(("a", 1L, 2000L), ("a", 2L, 2000L), ("a", 3L, 0L),
      ("b", 4L, 900L))
    def counts(now: Long): Map[String, Long] =
      Claims.claimCounts(ch, now).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(1000L) === Map("a" -> 2L, "b" -> 0L))
    assert(counts(2500L) === Map("a" -> 0L, "b" -> 0L))
  }

  test("at-least-once: claim -> expire -> re-claim delivers the same event") {
    val ch0 = channel(("a", 1L, 0L))
    val ch1 = Claims.claim(ch0, nowMs = 1000L, claimTtlMs = 500L, limit = 10)
    assert(snapshot(ch1) === Set(("a", 1L, 1500L)))
    // consumer dies; claim expires; a later poll re-claims msg 1
    val ch2 = Claims.claim(ch1, nowMs = 2000L, claimTtlMs = 500L, limit = 10)
    assert(snapshot(ch2) === Set(("a", 1L, 2500L)))
  }
}
