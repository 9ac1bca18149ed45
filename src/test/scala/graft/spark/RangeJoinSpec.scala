package graft.spark

import graft.engine.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval join: brute-force differential (including bucket-edge
  * and negative timestamps), at-most-once pair emission, and the
  * no-nested-loop plan contract. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("differential: random points/intervals match the nested-loop reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 4) {
      // include negatives and bucket-boundary values on trial 3
      val span = if (trial == 3) 200 else 2000
      val shift = if (trial == 3) -100 else 0
      val points = (0 until 300).map(i =>
        (rnd.nextInt(5).toLong, (rnd.nextInt(span) + shift).toLong, i.toLong))
      val intervals = (0 until 80).map { i =>
        val st = (rnd.nextInt(span) + shift).toLong
        (rnd.nextInt(5).toLong, st, st + rnd.nextInt(300).toLong, (1000 + i).toLong)
      }
      val width = 50L + rnd.nextInt(200)
      val got = RangeJoin.pointInInterval(
          points.toDF("k", "ts", "pid"),
          intervals.toDF("k", "st", "en", "iid"),
          "k", "ts", "st", "en", bucketWidth = width)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = for {
        (pk, ts, pid) <- points
        (ik, st, en, iid) <- intervals
        if pk == ik && ts >= st && ts <= en
      } yield (pid, iid)
      assert(got.sorted === expected.sorted, s"trial $trial width=$width")
      // at-most-once: no duplicate pairs from multi-bucket intervals
      assert(got.length === got.distinct.length, s"trial $trial dup pairs")
    }
  }

  test("plan contract: equi-join on (key, bucket), no nested loop / cartesian") {
    val s = spark
    import s.implicits._
    val points = (0 until 100).map(i => (i.toLong % 5, i.toLong, i.toLong))
      .toDF("k", "ts", "pid")
    val intervals = (0 until 50).map(i => (i.toLong % 5, i.toLong, i.toLong + 30, i.toLong))
      .toDF("k", "st", "en", "iid")
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "ts", "st", "en", 25L)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("column collision is rejected with a clear error") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 2L, 3L)).toDF("k", "ts", "x")
    val intervals = Seq((1L, 2L, 3L, 4L)).toDF("k", "st", "en", "x")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "k", "ts", "st", "en", 10L)
    }
    assert(e.getMessage.contains("collision"))
  }
}
