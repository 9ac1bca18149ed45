package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic training-shard export: a reproducible GLOBAL shuffle of a
 * corpus (documents or packed sequences) into `nShards` output shards.
 *
 * Training runs read shards sequentially, so the shuffle must happen at
 * export time, be unbiased (every shard an i.i.d.-looking sample — sources
 * interleaved, no adjacency correlated with ingest order), and be
 * REPRODUCIBLE: the same corpus + seed must yield byte-identical shards on
 * any engine, any partitioning, any rerun (data ordering affects training,
 * so an irreproducible shuffle makes runs uncomparable).
 *
 * Everything is keyed on the engine-portable md5 shuffle key (same family
 * as [[Sampling]]): h = first 15 hex chars of md5("<seed>:<id>") read as a
 * 60-bit integer. `shard = h mod nShards` balances by the law of large
 * numbers; `pos = rank of (h, id) within the shard` is the within-shard
 * read order. No RNG, no `rand()` (whose draw depends on partitioning).
 *
 * Scale shape: assignment is scan-local (a hash per row, no shuffle); the
 * position rank / write sort moves each row ONCE into its shard and sorts
 * shard-locally — the same single exchange the shard write itself requires,
 * with one sorting task per shard. Size `nShards` so a shard is
 * ~100-500 MB (nShards grows with the corpus; there is never a global
 * sort or a driver collect).
 */
object Sharding {

  /** The engine-portable shuffle key: uniform 60-bit integer from
    * md5("<seed>:<key>"). 15 hex chars keep it positive in a long and
    * exactly representable (no double rounding) on any SQL engine. */
  def shuffleKey(keyCol: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"),
      keyCol.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Adds `shard` (0..nShards-1) and the shuffle key `h` — scan-local, no
    * shuffle; the minimal columns a custom writer needs. */
  def withShard(df: DataFrame, idCol: String, nShards: Int, seed: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val taken = df.columns.toSet.intersect(Set("h", "shard"))
    require(taken.isEmpty,
      s"input already has reserved column(s): ${taken.mkString(", ")} — alias first")
    val h = shuffleKey(col(idCol), seed)
    df.withColumn("h", h).withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
  }

  /** Full assignment table: (shard, pos, id) — `pos` is the 1-based read
    * position within the shard. One exchange (rows to their shard) + a
    * shard-local sort, exactly the work of writing the shards. */
  def shardAssignments(df: DataFrame, idCol: String, nShards: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    withShard(df.select(idCol), idCol, nShards, seed)
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col(idCol))
  }

  /** The corpus arranged for a sharded write: repartitioned by shard and
    * sorted (shard, h, id) within partitions, so
    * `.write.partitionBy("shard")` emits each shard's rows in the
    * deterministic read order. Kept separate from the write itself so plans
    * are assertable without I/O. */
  def shardedForWrite(df: DataFrame, idCol: String, nShards: Int, seed: Long): DataFrame =
    withShard(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col(idCol))
      .drop("h")

  /** Convenience writer: parquet shards under `path`, one directory per
    * shard (`shard=N/`), rows in shuffle order. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, seed: Long,
                  path: String): Unit =
    shardedForWrite(df, idCol, nShards, seed)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-shard balance/interleave report: row count plus distinct count of
    * an interleave column (e.g. source) — the export-time check that no
    * shard is starved of a source and sizes are level. */
  def shardStats(df: DataFrame, idCol: String, interleaveCol: String,
                 nShards: Int, seed: Long): DataFrame =
    withShard(df, idCol, nShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(interleaveCol)).as("n_" + interleaveCol))
      .orderBy("shard")
}
