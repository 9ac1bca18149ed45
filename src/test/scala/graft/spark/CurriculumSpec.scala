package graft.spark

import graft.pipeline.{Curriculum, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5e: curriculum difficulty buckets (distributed global rank) and
  * contrastive hard-negative mining (banded top-k). */
class CurriculumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("difficultyBuckets: bucket = floor(rank*b/N) under (score, id) order") {
    val s = spark
    import s.implicits._
    // scores with ties: ranks resolved by id
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 10L), (5L, 40L),
                 (6L, 20L)).toDF("id", "score")
    val got = Curriculum.difficultyBuckets(df, "id", "score", nBuckets = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    // order: (10,2)(10,4)(20,3)(20,6)(30,1)(40,5) -> ranks 0..5, bucket=rank*3/6
    assert(got === Seq((1L, 2), (2L, 0), (3L, 1), (4L, 0), (5L, 2), (6L, 1)))
  }

  test("PROPERTY: difficultyBuckets matches a sequential reference, any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(50).toLong))
    for (parts <- Seq(1, 7); b <- Seq(1, 4, 10)) {
      val expected = rows.sortBy { case (i, sc) => (sc, i) }.zipWithIndex
        .map { case ((i, _), rk) => (i, (rk.toLong * b / rows.size).toInt) }.toMap
      val got = Curriculum.difficultyBuckets(
          rows.toDF("id", "score").repartition(parts), "id", "score", b)
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      assert(got === expected, s"parts=$parts b=$b")
    }
  }

  test("difficultyBuckets: empty input yields an empty frame with the schema") {
    val s = spark
    import s.implicits._
    val out = Curriculum.difficultyBuckets(
      Seq.empty[(Long, Long)].toDF("id", "score"), "id", "score", 10)
    assert(out.columns.toSeq === Seq("id", "score", "bucket"))
    assert(out.count() === 0L)
  }

  test("hardNegatives: band excludes near-duplicates above and easy negatives below") {
    val s = spark
    import s.implicits._
    // query 0 = (1,0); corpus: exact copy (id 10), orthogonal (id 11),
    // opposite (id 12), and two in-band vectors at cos .8 and .6
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),
      (10L, Seq(1.0, 0.0)),            // cos 1.0 — above maxSim, excluded
      (11L, Seq(0.0, 1.0)),            // cos 0.0 — below minSim, excluded
      (12L, Seq(-1.0, 0.0)),           // cos -1 — excluded
      (13L, Seq(0.8, 0.6)),            // cos 0.8
      (14L, Seq(0.6, 0.8)))            // cos 0.6
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 3, minSim = 0.5, maxSim = 0.95)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(out === Seq((1, 13L), (2, 14L)))
  }

  test("PROPERTY: hardNegatives equals banded brute force on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    def vec() = Seq.fill(4)(rnd.nextDouble() * 2 - 1)
    val rows = (0L until 120L).map(i => (i, vec()))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val (lo, hi, k) = (0.1, 0.8, 5)
    val queries = rows.take(6)
    val expected = queries.flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .filter { case (_, sc) => sc >= lo && sc <= hi }
        .sortBy { case (nid, sc) => (-sc, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, _), r) => (qid, r + 1, nid) }
    }.toSet
    val df = rows.toDF("vec_id", "embedding").repartition(5)
    val got = Similarity.hardNegatives(df, df.where(col("vec_id") < 6),
        "vec_id", "embedding", k, lo, hi)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
  }
}
