package graft.spark

import graft.pipeline.{Outliers, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding outliers: exact centroid, planted far-point recovery in
  * magnitude order, z-score gating, and partitioning invariance. Also the
  * JL random-projection contracts (determinism, exact-copy preservation,
  * approximate cosine agreement, projectedTopK planted recall). */
class OutliersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randVecs(n: Int, dims: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dims)(rnd.nextGaussian())))
  }

  test("centroid is the exact per-dim mean") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 6.0))).toDF("id", "v")
    assert(Outliers.centroid(df, "v").toSeq === Seq(2.0, 4.0))
  }

  test("cosine: a zero-norm vector scores 0 instead of aborting the job " +
       "(ANSI DIVIDE_BY_ZERO)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.0, 0.0))) // failed/empty embedder output
      .toDF("id", "vec")
    val queries = corpus.where(col("id") === 1L)
    // brute force over a corpus containing the zero vector must not throw,
    // and the zero vector must rank LAST (score 0 < any real similarity)
    val got = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.last._1 === 3L && got.last._2 === 0.0)
    // direct expression check, both sides
    val sc = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(sc === 0.0)
  }

  test("lshTopK recalls a planted copy and tolerates zero-norm rows " +
       "(ids-only shuffle path)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
    // plant an exact copy of row 0 at id 100, and a zero vector at id 101
    val corpus = (base ++ Seq((100L, base.head._2), (101L, Seq.fill(16)(0.0))))
      .toDF("id", "vec")
    val queries = corpus.where(col("id") === 0L)
    val top = Similarity.lshTopK(corpus, queries, "id", "vec", k = 3)
      .orderBy("rank").collect()
    assert(top.nonEmpty)
    // the exact copy shares every band bucket, so recall at rank 1 is
    // guaranteed; score is cosine 1 up to float rounding
    assert(top.head.getLong(2) === 100L)
    assert(math.abs(top.head.getDouble(3) - 1.0) < 1e-9)
  }

  test("centroid survives huge component magnitudes (decimal(38,15) " +
       "headroom — a narrower cast overflowed at 1e10 under ANSI)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(4.0e12, -2.0e12)), (2L, Seq(2.0e12, -6.0e12)))
      .toDF("id", "v")
    val c = Outliers.centroid(df, "v")
    assert(c.toSeq === Seq(3.0e12, -4.0e12))
    assert(c.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("centroid is bit-identical under any partitioning (decimal accumulation)") {
    val s = spark
    import s.implicits._
    // gaussians: full-precision doubles, where float summation ORDER wobbles
    val df = randVecs(500, 16, seed = 7).toDF("id", "v")
    val c1 = Outliers.centroid(df.repartition(1), "v")
    val c7 = Outliers.centroid(df.repartition(7, col("id")), "v")
    val c13 = Outliers.centroid(df.repartition(13, pmod(col("id"), lit(5))), "v")
    assert(c1.toSeq === c7.toSeq)
    assert(c1.toSeq === c13.toSeq)
  }

  test("planted far points rank by magnitude, invariant to partitioning") {
    val s = spark
    import s.implicits._
    val base = randVecs(200, 8, seed = 3)
    val planted = (0 until 5).map { i =>
      val u = randVecs(1, 8, seed = 100 + i).head._2
      val n = math.sqrt(u.map(x => x * x).sum)
      (1000L + i, u.map(_ / n * (50.0 + 10 * i)))
    }
    val df = (base ++ planted).toDF("id", "v")
    for (parts <- Seq(2, 7)) {
      val got = Outliers.topOutliers(df.repartition(parts), "id", "v", k = 5)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(got === Seq(1004L, 1003L, 1002L, 1001L, 1000L), s"parts=$parts")
    }
  }

  test("null and ragged vectors are excluded, not a crash") {
    val s = spark
    import s.implicits._
    val base = randVecs(50, 8, seed = 7)
    val df = base.toDF("id", "v")
      .unionByName(Seq((900L, Seq(1.0, 2.0))).toDF("id", "v")) // ragged
      .unionByName(Seq(Tuple1(901L)).toDF("id")
        .withColumn("v", lit(null).cast("array<double>")))
    val top = Outliers.topOutliers(df, "id", "v", k = 60)
      .collect().map(_.getLong(1)).toSet
    assert(!top.contains(900L) && !top.contains(901L))
    assert(top.size === 50)
    val z = Outliers.zscoreOutliers(df, "id", "v", z = -10.0)
      .collect().map(_.getLong(0)).toSet
    assert(z === base.map(_._1).toSet)
  }

  test("zscoreOutliers gates planted rows only") {
    val s = spark
    import s.implicits._
    val base = randVecs(300, 8, seed = 5)
    val planted = Seq((9001L, Seq.fill(8)(30.0)), (9002L, Seq.fill(8)(-40.0)))
    val df = (base ++ planted).toDF("id", "v")
    val flagged = Outliers.zscoreOutliers(df, "id", "v", z = 5.0)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(9001L, 9002L))
  }

  test("randomProject is deterministic and preserves exact equality") {
    val s = spark
    import s.implicits._
    val df = randVecs(50, 32, seed = 9).toDF("id", "v")
    val a = df.select(col("id"), Similarity.randomProject(col("v"), 8).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = df.repartition(7)
      .select(col("id"), Similarity.randomProject(col("v"), 8).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b)
    assert(a(0L).size === 8)
    // identical inputs project identically
    val twin = df.where(col("id") === 0).select(lit(99L).as("id"), col("v"))
    val tp = twin.select(Similarity.randomProject(col("v"), 8))
      .head().getSeq[Double](0)
    assert(tp === a(0L))
  }

  test("projection approximately preserves cosine (JL)") {
    val s = spark
    import s.implicits._
    val df = randVecs(40, 64, seed = 21).toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(
        Similarity.cosine(col("a.v"), col("b.v")).as("exact"),
        Similarity.cosine(
          Similarity.randomProject(col("a.v"), 24),
          Similarity.randomProject(col("b.v"), 24)).as("approx"))
      .collect()
    val mae = pairs.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / pairs.length
    assert(mae < 0.2, s"mean abs cosine error $mae")
  }

  test("projectedTopK recalls planted exact copies at rank 1") {
    val s = spark
    import s.implicits._
    val base = randVecs(300, 32, seed = 33).toDF("id", "v")
    val queries = base.where(col("id") < 8)
    val corpus = base.unionByName(
      queries.select((col("id") + 5000L).as("id"), col("v")))
    val got = Similarity.projectedTopK(corpus, queries, "id", "v",
        k = 1, outDims = 8, rerank = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === (0 until 8).map(i => i.toLong -> (5000L + i)).toMap)
  }
}
