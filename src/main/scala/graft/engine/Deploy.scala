package graft.engine

/**
 * Deployment tuning: the Spark configuration this engine is designed
 * against at cluster scale. Test harnesses use local[32]; a 100 TB
 * deployment sets these on the session (or spark-submit) so the operators'
 * partitioning assumptions hold.
 *
 * Rationale per key:
 *  - shuffle.partitions ~ 2-3x total cores: every resolve fold, dedup
 *    band join and consolidation shuffles on its keys; too few partitions
 *    spill, too many churn small tasks. AQE coalesces down after the fact.
 *  - files.maxPartitionBytes 256m: the resolved store and parquet change
 *    logs are column-pruned scans (few, wide string columns); bigger input
 *    splits amortize scheduling without risking per-task memory (the fold
 *    is O(1) state per document).
 *  - adaptive.*: AQE re-plans skewed joins (dedup candidate joins on
 *    pathological band buckets) and converts shuffle joins to broadcast
 *    when the dim side turns out small (subscription tables, centroids).
 *  - skewJoin: self-joins on LSH band buckets are the one place data-
 *    dependent skew survives the bucket-size cap.
 *  - rocksdb state store: the streaming materializer keeps O(docs) fold
 *    state; the default in-memory store evicts to the JVM heap and dies at
 *    placement scale.
 */
object Deploy {

  def recommendedConf(totalCores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (totalCores * 2).toString,
    "spark.sql.files.maxPartitionBytes" -> "256m",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "64m",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")

  /** Apply the recommended runtime-settable subset to a live session
    * (static keys like the state store provider must be set at build). */
  def tune(spark: org.apache.spark.sql.SparkSession, totalCores: Int): Unit =
    recommendedConf(totalCores).foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf on live session
    }
}
