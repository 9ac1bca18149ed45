package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Queue semantics (SURVEY §2.1, §2.6): at-least-once opaque-message queues
 * with claim-based polling, and the sorted deduplicating queue
 * (BaseQueueService.java:13-57, PersistentSortedQueue.java).
 *
 * At scale the durable form is a Kafka topic (poll = micro-batch, ack =
 * checkpoint commit, claim TTL = trigger interval); these batch operators
 * express the same semantics relationally for bounded queues and power the
 * oracle checks: a queue is a DataFrame with (queue, msg_id: changeId-
 * ordered, payload), claims are a high-watermark column.
 */
object Queues {

  /** Poll: the next `limit` unclaimed messages in queue order. The returned
    * claim watermark (max msg_id) acks the batch when passed back. */
  def poll(queue: DataFrame, afterMsgId: Long, limit: Int): DataFrame =
    queue.where(col("msg_id") > afterMsgId)
      .orderBy("msg_id")
      .limit(limit)

  /** Deduplicating queue: one message per dedup key, keeping the FIRST
    * (lowest msg_id) — PersistentSortedQueue keeps global key order. The
    * semi join runs QUEUE-side so the survivors keep their payload
    * columns (the aggregate side has only the key and min id). */
  def dedup(queue: DataFrame, keyCol: String): DataFrame =
    queue.join(
      queue.groupBy(col(keyCol)).agg(min(col("msg_id")).as("msg_id")),
      Seq(keyCol, "msg_id"), "left_semi")

  /** Sorted-queue view: messages in dedup-key order (segment-split scan
    * order of the persistent sorted queue). */
  def sortedView(queue: DataFrame, keyCol: String): DataFrame =
    dedup(queue, keyCol).orderBy(keyCol)

  /** Size estimate, exact up to `limit` (Databus.java:45-57 semantics).
    * Limits past Int.MaxValue-1 fall back to a plain count (the probe-row
    * trick needs `limit+1` to fit an Int), but the contract is unchanged:
    * a count that still exceeds the near-2^31 limit — count() returns
    * Long — reports (limit, false) exactly like the probe path. */
  def sizeEstimate(queue: DataFrame, limit: Long): (Long, Boolean) = {
    require(limit >= 0, s"limit must be non-negative: $limit")
    if (limit >= Int.MaxValue - 1) {
      val n = queue.count()
      return (math.min(n, limit), n <= limit)
    }
    val n = queue.limit((limit + 1).toInt).count()
    if (n > limit) (limit, false) else (n, true)
  }

  /** Streaming DedupQueue: drop duplicate dedup-keys across micro-batches,
    * with state bounded by the event-time watermark — the streaming analog
    * of the sorted-queue dedup (duplicates beyond the lateness window are
    * impossible in the reference's sorted queues, so bounded state is the
    * same guarantee re-expressed for streams). `eventTimeCol` must be a
    * TimestampType column. */
  def streamingDedup(stream: DataFrame, keyCol: String, eventTimeCol: String,
                     lateness: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCol)
}

/**
 * Channel-naming scheme of a dedup queue (reference event/api
 * DedupEventStoreChannels.java): each queue has a WRITE channel (raw
 * appends land here) and a READ channel (the sorted, dedup'd side), named
 * by prefixing the queue name. `sharedWriteChannel` uses the bare queue
 * name as the write channel so that a plain event store and a dedup queue
 * can interoperate on the same underlying channel. Reverse lookups return
 * None for a channel of the other kind; when one prefix is a prefix of the
 * other, the LONGER prefix wins.
 */
final case class DedupChannels(writePrefix: String, readPrefix: String) {
  require(writePrefix != readPrefix, "write and read prefixes must differ")

  def writeChannel(queue: String): String = writePrefix + queue
  def readChannel(queue: String): String = readPrefix + queue

  def queueFromWriteChannel(channel: String): Option[String] =
    queueFromChannel(channel, writePrefix, readPrefix)
  def queueFromReadChannel(channel: String): Option[String] =
    queueFromChannel(channel, readPrefix, writePrefix)

  private def queueFromChannel(channel: String, required: String,
                               disallowed: String): Option[String] =
    if (channel.startsWith(disallowed) && disallowed.length > required.length) None
    else if (channel.startsWith(required)) Some(channel.substring(required.length))
    else None
}

object DedupChannels {
  /** Separate namespaces for raw and dedup'd events. */
  def isolated(writePrefix: String, readPrefix: String): DedupChannels =
    DedupChannels(writePrefix, readPrefix)
  /** Write channel IS the plain queue channel (migration-compatible). */
  def sharedWriteChannel(readPrefix: String): DedupChannels =
    DedupChannels("", readPrefix)
}
