package graft.spark

import graft.pipeline.TopKSketch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving top-k: exact below capacity (partitioning-invariant),
  * over-estimate-within-err and heavy-hitter retention above capacity. */
class TopKSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sketch(rows: Seq[String], n: Int, capacity: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    rows.toDF("t").repartition(parts)
      .agg(TopKSketch.topK(col("t"), n, capacity).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select("e.item", "e.count", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("exact below capacity, err 0, partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)(s"tok${rnd.nextInt(30)}")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = truth.toSeq.sortBy { case (i, c) => (-c, i) }.take(10)
      .map { case (i, c) => (i, c, 0L) }
    for (parts <- Seq(1, 4, 7))
      assert(sketch(rows, n = 10, capacity = 64, parts).toSeq === expected, s"parts=$parts")
  }

  test("above capacity: counts over-estimate within err; heavy hitters retained") {
    val rnd = new scala.util.Random(17)
    // zipf-ish: few heavy items + a long tail of singletons
    val heavy = (0 until 5).flatMap(i => Seq.fill(400 - 50 * i)(s"heavy$i"))
    val tail = (0 until 3000).map(i => s"tail$i")
    val rows = rnd.shuffle(heavy ++ tail)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sketch(rows, n = 20, capacity = 256, parts = 4)
    got.foreach { case (item, count, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(count >= t, s"$item undercounted: $count < $t")
      assert(count - err <= t, s"$item bound violated: $count - $err > $t")
    }
    // every item with true frequency > N/capacity must be reported
    val threshold = rows.size.toDouble / 256
    val reported = got.map(_._1).toSet
    truth.filter(_._2 > threshold).keys.foreach { h =>
      assert(reported.contains(h), s"heavy hitter $h missing")
    }
    // and the 5 planted heavies lead the ranking
    assert(got.take(5).map(_._1).toSet === (0 until 5).map(i => s"heavy$i").toSet)
  }

  test("null inputs are ignored") {
    val s = spark
    import s.implicits._
    val got = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("t")
      .agg(TopKSketch.topK(col("t"), 5, 16).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }
}
