package graft.spark

import graft.pipeline.Profile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE profiling: null counts, exact-below-capacity NDV, numeric
  * min/max before the string cast, non-native NDV types, guards. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile row per column: nulls, ndv, min/max; numeric order beats string order") {
    val s = spark
    import s.implicits._
    // 9 vs 10: string min would be "10" — numeric compare must win
    val df = Seq((9L, Some("b"), Some(1.5)), (10L, None, Some(2.5)),
      (11L, Some("a"), None), (9L, Some("b"), Some(0.5)))
      .toDF("k", "tag", "score")
    val got = Profile.analyze(df, Seq("k", "tag", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("k") === ((4L, 0L, 3L, "9", "11")))
    assert(got("tag") === ((4L, 1L, 2L, "a", "b")))
    // doubles: ndv via canonical string form; min/max numeric
    assert(got("score")._2 === 1L)
    assert(got("score")._3 === 3L)
    assert(got("score")._4 === "0.5" && got("score")._5 === "2.5")
  }

  test("ndv is exact below capacity at any partitioning; estimates above") {
    val s = spark
    import s.implicits._
    val df = spark.range(20000).select((col("id") % 1777).as("v"))
    for (p <- Seq(1, 7)) {
      val ndv = Profile.analyze(df.repartition(p), Seq("v"))
        .collect()(0).getLong(3)
      assert(ndv === 1777L, s"parts=$p")
    }
  }

  test("all-null column and unknown column guard") {
    val s = spark
    import s.implicits._
    val df = Seq((1, None: Option[String]), (2, None)).toDF("a", "b")
    val got = Profile.analyze(df, Seq("b")).collect()(0)
    assert(got.getLong(2) === 2L && got.getLong(3) === 0L)
    assert(got.isNullAt(4) && got.isNullAt(5))
    intercept[IllegalArgumentException] { Profile.analyze(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.analyze(df, Seq.empty) }
  }
}
