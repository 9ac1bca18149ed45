package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Curriculum bucketing: assign every document an ordinal difficulty bucket
 * (0 .. nBuckets-1) by its global rank under a difficulty score — the
 * short-to-long / easy-to-hard ordering curriculum training schedules
 * consume (Bengio et al. 2009; in LLM data work the score is usually
 * length, perplexity, or a quality-classifier margin).
 *
 * Bucket rule (pinned so an external oracle reproduces it exactly):
 * `bucket = floor(rank0 * nBuckets / N)` where rank0 is the 0-based global
 * rank under (score asc, id asc) and N the row count — all-integer, no
 * ntile edge semantics, stable under ties.
 *
 * Scale shape: global rank WITHOUT a global sort-to-one-reducer — reuses
 * [[Packing.withStartOffsets]]'s two-phase prefix sum over a range
 * partitioning (per-partition counts to the driver, seeded running sums),
 * so the only wide op is the range exchange; no window over the whole
 * corpus anywhere.
 */
object Curriculum {

  /** (idCol, scoreCol, bucket) — one row per input row. `scoreCol` must be
    * orderable; ties break on id, so buckets are fully deterministic. */
  def difficultyBuckets(df: DataFrame, idCol: String, scoreCol: String,
                        nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // persist the slim (id, score) projection BEFORE the count: the input
    // may be a whole unpersisted curation pipeline, and without this the
    // count() action would re-execute that entire lineage just to learn N
    val slim = df.select(col(idCol), col(scoreCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = slim.count()
    if (n == 0L) {
      slim.unpersist()
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          slim.schema.fields :+
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.IntegerType, nullable = false)))
    }
    // start_offset of a unit-weight row under (score, id) order IS the
    // 0-based global rank; withStartOffsets range-partitions on exactly
    // that key pair
    val ranked = Packing.withStartOffsets(
      slim.withColumn("_one", lit(1L)),
      idCol, "_one", orderCol = Some(scoreCol))
    // withStartOffsets has already materialized its session-cached sorted
    // scan (phase-1 collect), so `ranked` reads that cache, not slim — drop
    // slim now instead of leaking one frame per call for the session
    slim.unpersist(false)
    // DIV = exact long division (Column./ would round-trip through double)
    ranked.select(col(idCol), col(scoreCol),
      expr(s"CAST((start_offset * $nBuckets) DIV $n AS INT)").as("bucket"))
  }
}
