package graft.spark

import graft.pipeline.{KllBuffer, QuantileSketch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch: exact below capacity under any partitioning,
  * bounded rank error above capacity, weight conservation, null/typed
  * input handling, SQL surface parity. */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** discrete quantile the engine and the sketch both define: min value
    * whose cumulative count >= ceil(q/1000 * n) over the sorted multiset. */
  private def exactQ(values: Seq[Long], q: Int): Long = {
    val sorted = values.sorted
    val target = math.ceil(q / 1000.0 * sorted.length).toInt
    sorted(target - 1)
  }

  test("exact regime: sketch equals the discrete quantile at any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61)
    val values = Seq.fill(3000)(rnd.nextInt(1000000).toLong) // open domain, n < capacity
    val ps = Seq(100, 250, 500, 750, 990)
    for (parts <- Seq(1, 4, 13)) {
      val got = values.toDF("v").repartition(parts)
        .agg(QuantileSketch.quantiles(col("v"), ps, capacity = 4096).as("qs"))
        .select(explode(col("qs")).as("q"))
        .select(col("q.q_permille"), col("q.value"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      ps.foreach { q =>
        assert(got(q) === exactQ(values, q), s"q=$q parts=$parts")
      }
    }
  }

  test("approximate regime: rank error bounded well under capacity fraction") {
    val s = spark
    import s.implicits._
    val n = 200000
    // adversarial-ish: sorted-ascending arrival (worst case for naive sampling)
    val values = (0 until n).map(_.toLong)
    val ps = Seq(100, 500, 900)
    val got = values.toDF("v")
      .agg(QuantileSketch.quantiles(col("v"), ps, capacity = 1024).as("qs"))
      .select(explode(col("qs")).as("q"))
      .select(col("q.q_permille"), col("q.value"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // values are 0..n-1 so a value IS its rank: rank error directly readable.
    // KLL rank error ~ O(levels/capacity); assert a loose 2% of n.
    ps.foreach { q =>
      val trueRank = math.ceil(q / 1000.0 * n).toLong - 1
      val err = math.abs(got(q) - trueRank).toDouble / n
      assert(err < 0.02, s"q=$q estimate=${got(q)} trueRank=$trueRank relRankErr=$err")
    }
  }

  test("compaction conserves total weight exactly (odd leftovers included)") {
    val buf = new KllBuffer(64)
    val rnd = new scala.util.Random(7)
    val n = 10007 // odd, forces leftover paths
    (0 until n).foreach(_ => buf.insert(rnd.nextInt(1 << 30).toLong))
    assert(buf.totalWeight === n.toLong)
  }

  test("merge of exact partials whose sizes sum under capacity stays exact") {
    val s = spark
    import s.implicits._
    val values = (1 to 900).map(_.toLong * 17)
    // grouped: each group small; 16 partitions force real partial merges
    val df = values.zipWithIndex.map { case (v, i) => (i % 3, v) }.toDF("g", "v")
    val got = df.repartition(16)
      .groupBy("g").agg(QuantileSketch.quantiles(col("v"), Seq(500), capacity = 1024).as("qs"))
      .select(col("g"), explode(col("qs")).as("q"))
      .select(col("g"), col("q.value"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 3).foreach { g =>
      val mine = values.zipWithIndex.filter(_._2 % 3 == g).map(_._1)
      assert(got(g) === exactQ(mine, 500), s"group $g")
    }
  }

  test("nulls ignored; int input; empty group yields empty array") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(5), None, Some(1), Some(9), None).toDF("v")
    val got = df.agg(QuantileSketch.quantiles(col("v"), Seq(500)).as("qs"))
      .select(explode(col("qs")).as("q")).select(col("q.value"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(5L)) // median of {1,5,9}
    val empty = Seq.empty[Option[Int]].toDF("v")
      .agg(QuantileSketch.quantiles(col("v"), Seq(500)).as("qs"))
      .select(size(col("qs"))).collect()(0).getInt(0)
    assert(empty === 0)
  }

  test("SQL surface emo_kll_quantiles matches the Column API") {
    val s = spark
    import s.implicits._
    graft.engine.GraftFunctions.register(spark)
    val values = Seq.fill(500)(scala.util.Random.nextInt(10000).toLong)
    values.toDF("v").createOrReplaceTempView("kllt")
    val viaSql = spark.sql(
      "SELECT explode(emo_kll_quantiles(v, array(250, 750))) AS q FROM kllt")
      .select(col("q.q_permille"), col("q.value"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaSql(250) === exactQ(values, 250))
    assert(viaSql(750) === exactQ(values, 750))
  }
}
