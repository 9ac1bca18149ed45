package graft.spark

import graft.engine.AsofJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join: golden tie/horizon semantics, a brute-force differential on
  * random streams, and the one-shuffle plan contract. */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden: latest right at-or-before each left; equal ts matches; horizon nulls") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 100L, 10L), // after right rows at 50 and 90 -> matches 90
      (1L, 90L, 11L),  // ties with the right row at 90 -> inclusive match
      (1L, 40L, 12L),  // before every right row -> no match
      (2L, 500L, 13L)  // match at 100 but horizon 200 -> nulled
    ).toDF("k", "ts", "tie")
    val right = Seq(
      (1L, 50L, 1L, "a"), (1L, 90L, 2L, "b"), (2L, 100L, 3L, "c")
    ).toDF("k", "ts", "tie", "v")
    val got = AsofJoin.asof(left, right, "k", "ts", "tie", Seq("v"), horizon = 200L)
      .select("k", "ts", "asof_ts", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.getString(3)))).toSet
    assert(got === Set(
      (1L, 100L, Some(90L), Some("b")),
      (1L, 90L, Some(90L), Some("b")),
      (1L, 40L, None, None),
      (2L, 500L, None, None)))
  }

  test("all asof columns come from the SAME right row even with null fields") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "tie")
    // newer right row has a null second field: both outputs must still come
    // from the newer row (v2 null), not mix v2 from the older row
    val right = Seq(
      (1L, 50L, 1L, "old", "old2"),
      (1L, 80L, 2L, "new", null.asInstanceOf[String])
    ).toDF("k", "ts", "tie", "v1", "v2")
    val r = AsofJoin.asof(left, right, "k", "ts", "tie", Seq("v1", "v2"))
      .select("asof_v1", "asof_v2").collect()(0)
    assert(r.getString(0) === "new" && r.isNullAt(1))
  }

  test("differential: random streams match a per-key brute-force scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val left = (0 until 300).map(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val right = (0 until 200).map(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong, i.toLong))
      val horizon = 50L + rnd.nextInt(300)
      val got = AsofJoin.asof(left.toDF("k", "ts", "tie"),
          right.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", Seq("v"), horizon)
        .select("tie", "asof_v")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expected = left.map { case (k, ts, tie) =>
        val cands = right.filter(r => r._1 == k && r._2 <= ts && ts - r._2 <= horizon)
        // latest ts wins; equal ts -> larger tie wins (within-side tie order)
        tie -> cands.sortBy(r => (r._2, r._3)).lastOption.map(_._4)
      }.toMap
      assert(got === expected, s"trial $trial horizon=$horizon")
    }
  }

  test("plan contract: one hash exchange on the key, no join operator") {
    val s = spark
    import s.implicits._
    val left = (0 until 100).map(i => (i.toLong % 7, i.toLong, i.toLong)).toDF("k", "ts", "tie")
    val right = (0 until 100).map(i => (i.toLong % 7, i.toLong, (1000 + i).toLong, i.toLong))
      .toDF("k", "ts", "tie", "v")
    val plan = AsofJoin.asof(left, right, "k", "ts", "tie", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "as-of must not plan a join")
    val exchanges = "hashpartitioning".r.findAllIn(plan.toLowerCase).length
    assert(exchanges <= 2, s"expected a single key shuffle (+AQE read), got:\n$plan")
  }
}
