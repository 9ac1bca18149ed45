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
 * for version counts, content, deleted flags and timestamps. (The chained
 * MD5 signature is checkpointed into the synthetic delta's changeId seq so
 * versions keep counting correctly; signatures of compacted docs diverge
 * from the uncompacted fold by design — the reference stores the cutoff
 * signature in the compaction record for the same reason,
 * Compaction.java:20-60.)
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
  def compact(changes: DataFrame, cutoffMs: Long): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._

    val prefix = changes.where(col("ms") <= cutoffMs)
    val tail = changes.where(col("ms") > cutoffMs)

    // fold the prefix; keep per-doc stats needed to reconstruct intrinsics
    val folded = ResolveEngine.resolve(prefix)

    val baseDeltas = folded.map { d =>
      // delta literal reproducing the folded content (delete for tombstones)
      val deltaText = if (d.deleted) "~" else d.body
      ChangeRow(d.table, d.id,
        // the base delta sits at the last compacted position
        ms = d.last_update_ms,
        // seq encodes the compacted count so ~version parity is testable:
        // resolve adds (version-1) from the synthetic row's metadata
        seq = Long.MinValue + d.version, // orders before any real seq at same ms
        node = s"compaction:${d.version}:${d.first_update_ms}:${d.last_mutate_ms}",
        delta = deltaText,
        tags = d.last_tags)
    }.toDF()

    baseDeltas.unionByName(tail)
  }
}
