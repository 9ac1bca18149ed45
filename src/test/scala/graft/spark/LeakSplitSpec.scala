package graft.spark

import graft.pipeline.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leak-safe train/eval splits: exact copies co-travel under the content
  * key; near-dup cluster members co-travel under the cluster key; rows
  * outside clusters keep the deterministic content assignment. */
class LeakSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("contentSplitColumn: exact copies never straddle; id split would leak") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0 until 300).map(i => (i.toLong, s"doc ${rnd.nextInt(99999)} body $i"))
    // plant copies of every 5th doc under unrelated ids (including
    // whitespace-only normalization differences)
    val copies = base.filter(_._1 % 5 == 0).map { case (id, t) =>
      (id + 100000L, "  " + t.toUpperCase + " ")
    }
    val df = (base ++ copies).toDF("doc_id", "text")
      .withColumn("split", Sampling.contentSplitColumn(col("text"), 0.8))
    val straddled = df
      .groupBy(lower(trim(col("text"))))
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1)
      .count()
    assert(straddled === 0)
    // both sides populated at this size
    val bySplit = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "eval"))
    assert(bySplit("train") > bySplit("eval"))
  }

  test("leakSafeSplit: near-dup cluster members co-travel, others content-keyed") {
    val s = spark
    import s.implicits._
    // docs 0..99 distinct; near-dup chains {0,1,2} and {10,11} have
    // DIFFERENT text (so the content key alone would scatter them)
    val docs = (0 until 100).map(i => (i.toLong, s"unique text number $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val out = Sampling.leakSafeSplit(docs, "doc_id", "text", pairs, 0.8)
    val bySplitOfCluster = out.where(col("doc_id").isin(0L, 1L, 2L))
      .select("split").distinct().collect().map(_.getString(0))
    assert(bySplitOfCluster.length === 1, "cluster {0,1,2} straddled")
    val c2 = out.where(col("doc_id").isin(10L, 11L))
      .select("split").distinct().collect().map(_.getString(0))
    assert(c2.length === 1, "cluster {10,11} straddled")
    // unclustered rows match the plain content assignment
    val expected = docs.where(col("doc_id") > 11)
      .withColumn("split", Sampling.contentSplitColumn(col("text"), 0.8))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = out.where(col("doc_id") > 11)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
  }

  test("leakSafeSplit is rerun-stable and exhaustive") {
    val s = spark
    import s.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((3L, 4L)).toDF("id1", "id2")
    val a = Sampling.leakSafeSplit(docs, "doc_id", "text", pairs, 0.5)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = Sampling.leakSafeSplit(docs, "doc_id", "text", pairs, 0.5)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a === b)
    assert(a.length === 50)
    assert(a.forall(t => t._2 == "train" || t._2 == "eval"))
  }
}
