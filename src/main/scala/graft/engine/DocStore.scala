package graft.engine

import graft.condition._
import graft.json.JLong
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * The partitioned resolved-document store — the storage layout of the
 * serving layer at scale (SURVEY §4.3 phase-2 item).
 *
 * The reference spreads each table over a fixed shard fan-out inside the
 * row key (RowKeyUtils.java:20-70, 16 shards for new tables) so scans
 * parallelize; the Spark-native analog is directory partitioning of the
 * resolved store by (table, part) where part = the condition DSL's
 * partition id, abs(murmur3_32(table ++ id)) % S + 1
 * (ConditionEvaluator.java:266-276). With that layout, two condition forms
 * map straight onto Catalyst partition pruning — no custom rule needed,
 * because the pruning predicates are ordinary filters on partition columns
 * and the parquet source turns them into PartitionFilters (verified in
 * EngineSpec by `.queryExecution.executedPlan` inspection):
 *
 *  - `intrinsic("~table":...)` -> a filter on the `table` partition column;
 *  - `partition(N:...)` with N dividing S -> `part IN (the S-partitions
 *    whose N-partition id satisfies the sub-condition)`.
 *
 * The pruning predicate is a sound WEAKENING of the full condition (rows
 * outside it cannot match); the exact condition is always applied on top,
 * so unprunable forms (NOT, body predicates, N not dividing S) stay
 * correct — they just scan more directories.
 *
 * At 100 TB: the store is the output of the streaming materializer or the
 * batch fold, rewritten periodically with compaction; S=16 directories per
 * table keeps file listing O(tables), and a scan for one partition of one
 * table reads 1/(16·|tables|) of the data.
 */
object DocStore {

  val PartCol = "part"

  /** Number of storage partitions per table (RowKeyUtils.java:21 fan-out). */
  val DefaultShards = 16

  /** Write resolved docs (DocRow columns) as the partitioned store. */
  def write(docs: DataFrame, path: String, shards: Int = DefaultShards): Unit =
    docs
      .withColumn(PartCol, expressions.emoPartition(col("table"), col("id"), shards))
      .write
      .partitionBy("table", PartCol)
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scan the store with a condition DSL predicate; partition/table forms
    * of the condition land on the partition columns => directory pruning.
    * When the pruning predicate is EXACT — the condition is built only of
    * table-intrinsic and partition() forms, which are pure functions of
    * the partition columns — the per-row condition re-filter is skipped
    * entirely: the directory selection already decides membership, and the
    * row-level partition-hash evaluation it replaces is the dominant
    * per-row cost of a pruned serving scan. */
  def scan(spark: SparkSession, path: String, conditionText: String,
           shards: Int = DefaultShards): DataFrame = {
    val df = read(spark, path)
    val cond = graft.delta.DslParser.parseCondition(conditionText)
    prunePredicateEx(cond, shards) match {
      case Some((p, true))  => df.where(p)
      case Some((p, false)) => df.where(p).where(EmoDocs.predicate(df, conditionText))
      case None             => df.where(EmoDocs.predicate(df, conditionText))
    }
  }

  /** Write the store BUCKETED by document id (catalog table): repeated
    * joins and multiGets against a bucketed store are shuffle-free on the
    * store side — Spark matches the bucket hash partitioning instead of
    * exchanging, the single biggest shuffle saving for serving-layer joins
    * at 100 TB (verified no-ShuffleExchange in EngineSpec). The sortBy
    * gives within-bucket key order for efficient merge access. */
  def writeBucketed(docs: DataFrame, tableName: String,
                    buckets: Int = 64): Unit =
    docs.write
      .bucketBy(buckets, "id")
      .sortBy("id")
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)

  /** Sound weakening of `cond` onto the partition columns (None = no
    * pruning possible). Conjunctions prune on any prunable branch;
    * disjunctions need every branch prunable; negations never prune (the
    * negation of a weakening is not sound). */
  def prunePredicate(cond: Condition, shards: Int): Option[Column] =
    prunePredicateEx(cond, shards).map(_._1)

  /** [[prunePredicate]] plus an exactness flag: `true` means the pruning
    * predicate is EQUIVALENT to the condition (every pruned-in row
    * matches), not merely implied by it — table intrinsics and
    * partition() are pure functions of the partition columns, so a
    * condition composed only of those (under and/or) needs no row-level
    * re-check. A conjunction that drops unprunable branches is inexact by
    * construction; a disjunction must keep (and prove exact) every
    * branch. */
  def prunePredicateEx(cond: Condition, shards: Int): Option[(Column, Boolean)] = cond match {
    case ConstantCondition(false) => Some((lit(false), true))
    case PartitionCondition(n, sub) if n > 0 && shards % n == 0 =>
      // S-partition p maps to N-partition ((p-1) % N) + 1 when N | S:
      // both are (abs(hash) % k) + 1 over the same hash
      val keep = (1 to shards).filter { p =>
        ConditionEvaluator.eval(sub, JLong(((p - 1) % n) + 1L), null)
      }
      Some((col(PartCol).isin(keep: _*), true))
    case IntrinsicCondition(Intrinsic.Table, sub) =>
      Some((ConditionCompiler.compileField(sub, col("table"), StringType), true))
    case AndCondition(cs) =>
      val parts = cs.flatMap(prunePredicateEx(_, shards))
      if (parts.isEmpty) None
      else Some((parts.map(_._1).reduce(_ && _),
        parts.size == cs.size && parts.forall(_._2)))
    case OrCondition(cs) =>
      val parts = cs.map(prunePredicateEx(_, shards))
      if (parts.forall(_.isDefined))
        Some((parts.flatten.map(_._1).reduce(_ || _), parts.flatten.forall(_._2)))
      else None
    case _ => None
  }
}
