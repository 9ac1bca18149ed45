package graft.spark

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing (Schleimer et al. 2003): the w+k-1 detection guarantee on
  * random corpora, locality MinHash lacks, density, and edge cases. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randToks(rnd: scala.util.Random, n: Int, ns: String) =
    Seq.fill(n)(s"$ns${rnd.nextInt(100000)}")

  test("PROPERTY: any shared run of >= w+k-1 tokens is detected") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val (k, w) = (4, 3)
    for (trial <- 0 until 3) {
      val span = randToks(rnd, k + w - 1, s"sh$trial-") // exactly the guarantee length
      val docs = Seq(
        (1L, (randToks(rnd, 20, s"a$trial-") ++ span ++ randToks(rnd, 20, s"b$trial-")).mkString(" ")),
        (2L, (randToks(rnd, 15, s"c$trial-") ++ span ++ randToks(rnd, 25, s"d$trial-")).mkString(" ")),
        (3L, randToks(rnd, 40, s"e$trial-").mkString(" "))) // disjoint
        .toDF("id", "text")
      val pairs = Dedup.winnowedPairs(docs, "id", "text", k, w)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 2L)), s"trial $trial: $pairs")
    }
  }

  test("locality: a copied paragraph is found even when global jaccard is tiny") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val para = randToks(rnd, 30, "p-")
    val docs = Seq(
      (1L, (randToks(rnd, 400, "x-") ++ para).mkString(" ")),
      (2L, (para ++ randToks(rnd, 400, "y-")).mkString(" ")))
      .toDF("id", "text")
    val pairs = Dedup.winnowedPairs(docs, "id", "text", k = 5, w = 4)
      .collect()
    assert(pairs.length === 1 && pairs.head.getLong(2) >= 1L)
    // the same pair is invisible to global-jaccard near-dup at 0.5
    val j = Dedup.ngramJaccardPairs(docs, "id", "text", shingleN = 5)
      .collect().head.getDouble(2)
    assert(j < 0.1, s"fixture not local enough: jaccard $j")
  }

  test("density ~1/w, short docs, partitioning invariance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    val text = randToks(rnd, 200, "t-").mkString(" ")
    val df = Seq((1L, text), (2L, "ab"), (3L, "")).toDF("id", "text")
    val n = df.where(col("id") === 1)
      .select(size(Dedup.winnowFingerprints(col("text"), 5, 4)).as("n"))
      .head().getInt(0)
    val grams = 200 - 5 + 1
    assert(n > 0 && n <= grams && n >= grams / (2 * 4),
      s"selected $n of $grams grams") // ~2/(w+1) expected density
    // short/empty docs yield exactly one whole-doc print, no crash
    val short = df.where(col("id") >= 2)
      .select(size(Dedup.winnowFingerprints(col("text"), 5, 4)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(short === Seq(1, 1))
    val a = df.repartition(3).select(Dedup.winnowFingerprints(col("text"), 5, 4))
      .collect().map(_.getSeq[Long](0)).toSet
    val b = df.repartition(1).select(Dedup.winnowFingerprints(col("text"), 5, 4))
      .collect().map(_.getSeq[Long](0)).toSet
    assert(a === b)
  }
}
