package graft.resolve

import graft.json.JsonCodec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Batch compaction — the checkpoint analog of the reference's compaction
 * records (SURVEY §2.4: DefaultCompactor/AbstractCompactor/Compaction):
 * replace the resolved prefix of each document's delta log up to a cutoff
 * with ONE literal delta carrying the folded state, so future resolves read
 * `1 + |tail|` rows instead of the whole history.
 *
 * Where the reference compacts lazily behind reads with distributed race
 * control (~600 LoC), the Spark-native analog is a periodic OPTIMIZE-style
 * job: `compact(changes, cutoff)` produces the new, semantically equivalent
 * change log. The invariant (CompactorTest parity, verified in tests and by
 * the shared DuckDB oracle):
 *
 *   resolve(compact(log, cutoff)) == resolve(log)
 *
 * for version counts, content, deleted flags, timestamps AND the chained
 * MD5 signature: the fold signature at the cutoff is carried verbatim in
 * the checkpoint row and restored by the resolver, exactly as the reference
 * stores Compaction.getCutoffSignature (Compaction.java:20-60,
 * DefaultResolver.java:52/60/96) — ~signature is the optimistic-concurrency
 * token and must be stable across compaction.
 */
object Compactor {

  /**
   * Compact every document's changes with changeId.ms <= cutoffMs into one
   * synthetic base delta (a literal of the folded state, or a delete when
   * the folded state is a tombstone), keeping the tail untouched.
   *
   * One shuffle (the resolve fold of the prefix) + a cheap filter for the
   * tail; output is a standard changes DataFrame.
   */
  def compact(changes: DataFrame, cutoffMs: Long,
              placement: String = "default"): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._

    val prefix = changes.where(col("ms") <= cutoffMs)
    val tail = changes.where(col("ms") > cutoffMs)

    // fold the prefix UNDER THE DEPLOYMENT'S PLACEMENT: a placement-
    // conditional delta (`if intrinsic("~placement":...)`) folded under the
    // wrong placement would bake the wrong branch into the checkpoint
    // literal, violating resolve(compact(log)) == resolve(log) for any
    // session resolving with that placement
    val folded = ResolveEngine.resolve(prefix, placement)

    val baseDeltas = folded.map { d =>
      // checkpoint rows are marked out-of-band with a reserved delta prefix
      // (a control char, illegal as DSL text) so detection never keys on the
      // node id; the node carries the fold metadata INCLUDING the cutoff
      // signature, restored verbatim on resolve
      val deltaText = ResolveEngine.CheckpointDeltaPrefix.toString +
        (if (d.deleted) "~" else d.body)
      ChangeRow(d.table, d.id,
        // the base delta sits at the last compacted position
        ms = d.last_update_ms,
        seq = Long.MinValue + d.version, // orders before any real seq at same ms
        node = s"compaction:${d.version}:${d.first_update_ms}:${d.last_mutate_ms}:${d.signature}",
        delta = deltaText,
        tags = d.last_tags)
    }.toDF()

    baseDeltas.unionByName(tail)
  }

  /**
   * Compaction keeping the audit trail: the prefix deltas a compaction
   * replaces are archived to a history DataFrame with an expiry — the
   * reference's delta history (AbstractCompactor archives deltas at
   * compaction into a TTL'd history store; a document whose archive batch
   * would exceed MAX_DELTA_ARCHIVE_SIZE = 2 MB gets NO history, the
   * archive is discarded wholesale — AbstractCompactor.java:31,193-194,
   * DeltaHistoryTest.testDeltaHistoryDisabledIfTooLarge). Returns
   * (compacted log, archived rows + expire_ms); age the history out by
   * filtering `expire_ms > now` wherever it is served.
   */
  def compactWithHistory(changes: DataFrame, cutoffMs: Long, historyTtlMs: Long,
                         nowMs: Long,
                         maxArchiveBytes: Long = 2L * 1024 * 1024,
                         placement: String = "default"): (DataFrame, DataFrame) = {
    val prefix = changes.where(col("ms") <= cutoffMs)
    // octet_length, not length: MAX_DELTA_ARCHIVE_SIZE is a BYTE limit
    // (AbstractCompactor.java:31) — a character count under-measures
    // multi-byte UTF-8 deltas up to 4x and archives histories the
    // reference discards
    val sizes = prefix.groupBy("table", "key")
      .agg(sum(octet_length(col("delta"))).as("archive_bytes"))
    val history = prefix
      .join(sizes.where(col("archive_bytes") <= maxArchiveBytes)
        .select("table", "key"), Seq("table", "key"), "left_semi")
      .withColumn("expire_ms", lit(nowMs + historyTtlMs))
    (compact(changes, cutoffMs, placement), history)
  }

  /** Targeted compaction: checkpoint ONLY the hot coordinates (log size at
    * or above `threshold`, i.e. [[skewReport]]'s output), leaving cold logs
    * untouched — the incremental OPTIMIZE a deployment schedules, touching
    * a small fraction of the data instead of rewriting every log. */
  def compactHot(changes: DataFrame, cutoffMs: Long, threshold: Long,
                 placement: String = "default"): DataFrame = {
    val hot = changes.groupBy(col("table"), col("key"))
      .agg(count(lit(1)).as("n")).where(col("n") >= threshold)
      .select("table", "key")
    val hotChanges = changes.join(hot, Seq("table", "key"), "left_semi")
    val coldChanges = changes.join(hot, Seq("table", "key"), "left_anti")
    compact(hotChanges, cutoffMs, placement).unionByName(coldChanges)
  }

  /** Per-document delta-log sizes at or above `threshold` — the compaction
    * scheduler's input. The reference compacts lazily behind reads once a
    * log crosses a row threshold (DefaultDataStore.java:411-420); the batch
    * analog runs this report and feeds the hot coordinates to [[compact]].
    * This is also the skew monitor for the resolve fold: a coordinate whose
    * log outgrows one task's share is exactly one that must be compacted —
    * the fold itself is order-sensitive (chained signature, conditional
    * deltas), so checkpointing, not salting, is the scale-out path. */
  def skewReport(changes: DataFrame, threshold: Long = 1000L): DataFrame =
    changes.groupBy("table", "key")
      .agg(count(lit(1)).as("n_changes"),
        min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
      .where(col("n_changes") >= threshold)
      .orderBy(col("n_changes").desc, col("table"), col("key"))
}
