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

  test("intervalOverlap differential: random interval sets, exactly-once pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(53)
    for (trial <- 0 until 4) {
      val span = if (trial == 3) 150 else 1500
      val shift = if (trial == 3) -75 else 0
      def mk(n: Int, tag: Long) = (0 until n).map { i =>
        val st = (rnd.nextInt(span) + shift).toLong
        (rnd.nextInt(4).toLong, st, st + rnd.nextInt(200).toLong, tag + i)
      }
      val ls = mk(120, 0L)
      val rs = mk(90, 1000L)
      val width = 40L + rnd.nextInt(150)
      val got = RangeJoin.intervalOverlap(
          ls.toDF("k", "ls", "le", "lid"),
          rs.toDF("k", "rs", "re", "rid"),
          "k", "ls", "le", "rs", "re", bucketWidth = width)
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = for {
        (lk, lst, len0, lid) <- ls
        (rk, rst, ren, rid) <- rs
        if lk == rk && lst <= ren && rst <= len0
      } yield (lid, rid)
      assert(got.sorted === expected.sorted, s"trial $trial width=$width")
      assert(got.length === got.distinct.length, s"trial $trial dup pairs")
    }
  }

  test("intervalOverlap plan contract: equi-join, no nested loop") {
    val s = spark
    import s.implicits._
    val ls = (0 until 60).map(i => (i.toLong % 4, i.toLong, i.toLong + 20, i.toLong))
      .toDF("k", "ls", "le", "lid")
    val rs = (0 until 40).map(i => (i.toLong % 4, i.toLong * 2, i.toLong * 2 + 15, i.toLong))
      .toDF("k", "rs", "re", "rid")
    val plan = RangeJoin.intervalOverlap(ls, rs, "k", "ls", "le", "rs", "re", 25L)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
      s"interval overlap must not plan a nested loop:\n$plan")
  }
}
