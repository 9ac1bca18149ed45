package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Seed-stable Nx replication of a testdata SF dir (VERDICT r10 #7): the
 * oracle has never run above sf0.1, so this builds the sf1-probe fixture
 * the 10x-scale correctness spot-check reads. Each replica is a DISJOINT
 * key universe — every primary AND foreign key is remapped
 * `k -> k + rep*blockSize` where blockSize is (max PK of the family's
 * home table)+1, the SAME block for every table carrying that family
 * (c_custkey and o_custkey shift together), so join selectivity,
 * per-document change logs and per-user sessions keep their real shape
 * instead of fanning out NxN. Replica 0 is the IDENTITY — every original
 * key value survives verbatim, so queries/oracles that hardcode keys
 * still resolve. String keys keep replica 0 verbatim and suffix `#rep`
 * above it.
 *
 * Embeddings are densified through [[RecallProbe.densify]] (block id
 * layout, pseudo-random unit fillers above the originals) so ANN recall
 * runs against a genuinely denser corpus rather than ties between
 * identical copies; `documents` text is copied verbatim — exact N-way
 * duplicates are exactly what dedup must handle at density. The events
 * table keeps its ts values: each user lives in one replica, so "ts
 * monotone in event_id per user" (the arg_max oracle assumption) is
 * preserved.
 *
 * Usage: runMain graft.tools.ScaleFixture SRC_SF_DIR OUT_DIR [mult=10]
 */
object ScaleFixture {

  /** table -> (key column -> key family). The family's home table defines
    * the block size every member column shifts by. */
  val keyCols: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "regionkey"),
    "nation" -> Map("n_nationkey" -> "nationkey", "n_regionkey" -> "regionkey"),
    "customer" -> Map("c_custkey" -> "custkey", "c_nationkey" -> "nationkey"),
    "supplier" -> Map("s_suppkey" -> "suppkey", "s_nationkey" -> "nationkey"),
    "part" -> Map("p_partkey" -> "partkey"),
    "orders" -> Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "events" -> Map("event_id" -> "event_id", "user_id" -> "user_id"),
    "documents" -> Map("doc_id" -> "doc_id"),
    "embeddings" -> Map("vec_id" -> "vec_id"))

  /** family -> (home table, PK column) for block-size derivation. */
  val family: Map[String, (String, String)] = Map(
    "regionkey" -> ("region", "r_regionkey"),
    "nationkey" -> ("nation", "n_nationkey"),
    "custkey" -> ("customer", "c_custkey"),
    "suppkey" -> ("supplier", "s_suppkey"),
    "partkey" -> ("part", "p_partkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "event_id" -> ("events", "event_id"),
    "user_id" -> ("events", "user_id"),
    "doc_id" -> ("documents", "doc_id"),
    "vec_id" -> ("embeddings", "vec_id"))

  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1)
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // block size per family = max PK + 1 (numeric families only)
    val blocks: Map[String, Long] = family.flatMap { case (fam, (tbl, pk)) =>
      val df = spark.read.parquet(s"$src/$tbl.parquet")
      df.schema(pk).dataType match {
        case StringType => None
        case _ => Some(fam ->
          (df.agg(max(col(pk).cast("long"))).collect()(0).getLong(0) + 1L))
      }
    }
    println(s"[scalefixture] key-family blocks: $blocks")

    for ((table, keys) <- keyCols.toSeq.sortBy(_._1)) {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val big =
        if (table == "embeddings") RecallProbe.densify(df, mult)
        else {
          val reps = spark.range(mult).withColumnRenamed("id", "rep")
          keys.foldLeft(df.crossJoin(reps)) { case (acc, (k, fam)) =>
            val remapped = df.schema(k).dataType match {
              case StringType => when(col("rep") === 0, col(k))
                .otherwise(concat(col(k), lit("#"), col("rep")))
              case dt => (col(k).cast("long") + col("rep") * blocks(fam)).cast(dt)
            }
            acc.withColumn(k, remapped)
          }.drop("rep").repartition(32) // crossJoin inherits 1-2 partitions
        }
      big.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scalefixture] $table x$mult -> $out/$table.parquet")
    }
    spark.stop()
  }
}
