package graft.spark

import graft.pipeline.Kmv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct sketch: exact below k, bounded error above k,
  * partitioning-invariant merges, null/string handling. */
class KmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exact regime: estimate equals countDistinct while distinct < k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(53)
    val values = Seq.fill(5000)(rnd.nextInt(800).toLong) // ~800 distinct, dups
    val df = values.toDF("v")
    val Row = df.agg(
      Kmv.distinctCount(col("v"), k = 1024).as("kmv"),
      countDistinct(col("v")).as("exact")).collect()(0)
    assert(Row.getLong(0) === Row.getLong(1))
  }

  test("approximate regime: relative error within KMV bounds (deterministic)") {
    val s = spark
    import s.implicits._
    val n = 60000L
    val df = spark.range(n).select((col("id") * 2654435761L).as("v"))
    val est = df.agg(Kmv.distinctCount(col("v"), k = 1024)).collect()(0).getLong(0)
    // rse ~ 1/sqrt(k-2) ~ 3.1%; deterministic inputs give a fixed estimate
    val relErr = math.abs(est - n).toDouble / n
    assert(relErr < 0.1, s"estimate $est for $n distinct, relErr $relErr")
  }

  test("estimate is invariant to partitioning (merge correctness)") {
    val s = spark
    import s.implicits._
    val df = spark.range(30000).select((col("id") % 7000).as("v"))
    val ests = Seq(1, 3, 16).map { p =>
      df.repartition(p).agg(Kmv.distinctCount(col("v"), k = 512))
        .collect()(0).getLong(0)
    }
    assert(ests.distinct.size === 1, s"partitioning changed the estimate: $ests")
  }

  test("set operations: exact below capacity, bounded error above, partitioning-invariant") {
    val s = spark
    import s.implicits._
    // exact regime: sketches are complete hash sets -> all four counts exact
    val df = spark.range(12000).select(col("id"))
    def sketches(d: org.apache.spark.sql.DataFrame, k: Int) = d.agg(
      Kmv.sketch(when(col("id") % 2 === 0, col("id")), k).as("sa"),
      Kmv.sketch(when(col("id") % 3 === 0, col("id")), k).as("sb"))
    val exact = sketches(df.limit(600), k = 1024)
      .select(Kmv.setCounts(col("sa"), col("sb")).as("c"))
      .select("c.n_a", "c.n_b", "c.n_union", "c.n_intersect")
      .collect()(0)
    assert((exact.getLong(0), exact.getLong(1), exact.getLong(2), exact.getLong(3))
      === ((300L, 200L, 400L, 100L)))
    // estimate regime: 6000/4000/8000/2000 true counts, k = 512 -> rse ~4.4%
    val est = sketches(df, k = 512)
      .select(Kmv.setCounts(col("sa"), col("sb")).as("c"))
      .select("c.n_a", "c.n_b", "c.n_union", "c.n_intersect")
      .collect()(0)
    // intersection compounds union noise with the Jaccard-fraction
    // binomial (rse ~ sqrt(U/(I*k)) ~ 9% here), so its bound is looser
    val trues = Seq((6000L, 0.15), (4000L, 0.15), (8000L, 0.15), (2000L, 0.25))
    trues.zipWithIndex.foreach { case ((t, bound), i) =>
      val e = est.getLong(i)
      assert(math.abs(e - t).toDouble / t < bound, s"field $i: est $e vs true $t")
    }
    // merge correctness: estimates identical under any partitioning
    val ests = Seq(1, 3, 16).map { p =>
      sketches(df.repartition(p), k = 512)
        .select(Kmv.setCounts(col("sa"), col("sb")).as("c"))
        .select("c.n_union").collect()(0).getLong(0)
    }
    assert(ests.distinct.size === 1, s"partitioning changed the union estimate: $ests")
  }

  test("set operations with MIXED capacities: saturated small-k sketch is never misread as exact") {
    val s = spark
    import s.implicits._
    // a: k=64, saturated (6000 distinct evens); b: k=4096, complete (20
    // distinct multiples of 600). A bare-array design would see
    // |a| = 64 < 4096 and claim the union "exact" at 84; carrying k in
    // the sketch keeps the estimate near the true 6010.
    val df = spark.range(12000).select(col("id"))
    val skA = df.agg(Kmv.sketch(when(col("id") % 2 === 0, col("id")), k = 64).as("sa"))
    val skB = df.agg(Kmv.sketch(when(col("id") % 600 === 0, col("id")), k = 4096).as("sb"))
    val c = skA.crossJoin(skB)
      .select(Kmv.setCounts(col("sa"), col("sb")).as("c"))
      .select("c.n_a", "c.n_b", "c.n_union", "c.n_intersect").collect()(0)
    assert(c.getLong(1) === 20L) // complete side stays exact
    val trueUnion = 6010.0
    assert(math.abs(c.getLong(2) - trueUnion) / trueUnion < 0.30,
      s"union estimate ${c.getLong(2)} vs true $trueUnion")
    assert(c.getLong(2) > 3000L, "saturated sketch misread as complete set")
  }

  test("nulls ignored; string input supported; grouped aggregation") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", Some("x")), ("b", Some("x"))).toDF("g", "v")
    val got = df.groupBy("g").agg(Kmv.distinctCount(col("v"), k = 64).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 1L))
  }

  test("SQL surface: emo_kmv_distinct aggregates and groups like the Column API") {
    val s = spark
    import s.implicits._
    graft.engine.GraftFunctions.register(s)
    Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L))
      .toDF("g", "v").createOrReplaceTempView("kmv_t")
    val got = s.sql(
        "SELECT g, emo_kmv_distinct(v, 64) AS n FROM kmv_t GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === Seq("a" -> 2L, "b" -> 1L))
    // default-k single-arg form, whole-table aggregate
    assert(s.sql("SELECT emo_kmv_distinct(v) FROM kmv_t").head().getLong(0) === 3L)
  }
}
