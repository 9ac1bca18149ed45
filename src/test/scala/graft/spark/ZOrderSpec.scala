package graft.spark

import graft.pipeline.{ZOrder, ZOrderExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: Morton-code correctness (interpreted + codegen),
  * layout locality vs a single-column sort, filter-result invariance,
  * null and guard behavior. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** reference Morton interleave */
  private def morton(ranks: Seq[Int], bits: Int): Long = {
    var z = 0L
    for (j <- 0 until bits; i <- ranks.indices)
      if ((ranks(i) & (1 << j)) != 0) z |= 1L << (j * ranks.size + i)
    z
  }

  test("Morton code matches the bit-by-bit reference (2, 3, 4 dims)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    for (dims <- 2 to 4) {
      val bits = if (dims == 4) 15 else 16
      val rows = Seq.fill(200)(Seq.fill(dims)(rnd.nextInt(1 << bits)))
      val df = rows.map {
        case Seq(a, b) => (a, b, 0, 0)
        case Seq(a, b, c) => (a, b, c, 0)
        case Seq(a, b, c, d) => (a, b, c, d)
      }.toDF("a", "b", "c", "d")
      val cols = Seq("a", "b", "c", "d").take(dims).map(col)
      val got = df.select(ZOrder.interleave(cols, bits)).collect().map(_.getLong(0))
      rows.zip(got).foreach { case (r, z) =>
        assert(z === morton(r, bits), s"dims=$dims ranks=$r")
      }
    }
  }

  test("codegen and interpreted eval agree; adjacent cells are curve-close") {
    // known small values: (x,y) grid 0..7, z-order visits in the N-curve
    val s = spark
    import s.implicits._
    val grid = for (x <- 0 until 8; y <- 0 until 8) yield (x, y)
    val viaDf = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(viaDf((x, y)) === morton(Seq(x, y), 3))
    }
    // curve locality: (0,0),(1,0),(0,1),(1,1) are z = 0,1,2,3
    assert(viaDf((0, 0)) === 0L && viaDf((1, 0)) === 1L &&
      viaDf((0, 1)) === 2L && viaDf((1, 1)) === 3L)
  }

  test("null rank yields null z-value") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1), Some(2)), (None, Some(3)), (Some(4), None))
      .toDF("a", "b")
    val got = df.select(ZOrder.interleave(Seq(col("a"), col("b")), 8)).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("withZValue: row nulls rank at maxRank; an all-null column degrades gracefully") {
    val s = spark
    import s.implicits._
    // per-row null in a clustered column: the null-skipping least() pins
    // the rank to maxRank — z is non-null and nulls cluster at the top
    val mixed = Seq((1L, Some(10.0), 5.0), (2L, None, 5.0), (3L, Some(20.0), 5.0))
      .toDF("id", "a", "b")
    val z = ZOrder.withZValue(mixed, Seq("a", "b"), bits = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("__z"))).toMap
    assert(z.size === 3 && z.values.forall(_ >= 0L))
    // null-a row pins to maxRank: above the min-value row, tied with the
    // max-value row (which also scales to maxRank)
    assert(z(2L) > z(1L) && z(2L) === z(3L))
    // an entirely-null later column must not NPE on the driver-side min/max
    val allNull = Seq((1L, 1.0, Option.empty[Double]), (2L, 2.0, Option.empty[Double]))
      .toDF("id", "a", "b")
    val z2 = ZOrder.withZValue(allNull, Seq("a", "b"), bits = 4)
      .select("id", "__z").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(z2.size === 2)
    assert(z2(1L) < z2(2L)) // ordering still driven by the populated dim
  }

  test("clustered layout: narrow per-file windows on BOTH dims where a single-column sort leaves one dim wide") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val n = 20000
    val df = (0 until n).map(_ => (rnd.nextInt(100000), rnd.nextInt(100000)))
      .toDF("x", "y")
    val dirZ = java.nio.file.Files.createTempDirectory("zorder_").toString
    val dirX = java.nio.file.Files.createTempDirectory("xsort_").toString
    ZOrder.writeClustered(df, dirZ, Seq("x", "y"), files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)

    def meanWindow(dir: String, c: String): Double = {
      val w = ZOrder.fileWindows(spark.read.parquet(dir), c)
        .select((col("hi") - col("lo")).cast("double")).collect().map(_.getDouble(0))
      w.sum / w.length
    }
    val range = 100000.0
    // x-sorted: x windows tiny, y windows ~ full range
    assert(meanWindow(dirX, "x") < 0.2 * range)
    assert(meanWindow(dirX, "y") > 0.8 * range)
    // z-ordered: BOTH windows well under the full range
    assert(meanWindow(dirZ, "x") < 0.5 * range, "z layout x window")
    assert(meanWindow(dirZ, "y") < 0.5 * range, "z layout y window")
  }

  test("clustering is layout-only: box-filter results identical to the source") {
    val s = spark
    import s.implicits._
    val df = (0 until 5000).map(i => (i * 7 % 1000, i * 13 % 1000, i))
      .toDF("x", "y", "payload")
    val dir = java.nio.file.Files.createTempDirectory("zorder_eq_").toString
    ZOrder.writeClustered(df, dir, Seq("x", "y"), files = 8)
    val pred = col("x").between(100, 300) && col("y").between(500, 700)
    val expect = df.where(pred).select("payload").collect().map(_.getInt(0)).sorted
    val got = spark.read.parquet(dir).where(pred)
      .select("payload").collect().map(_.getInt(0)).sorted
    assert(got.toSeq === expect.toSeq)
  }

  test("guards: >4 dims, bit overflow, existing z column are rejected") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ZOrder.withZValue(df, Seq("a", "b"), bits = 32)
    }
    intercept[IllegalArgumentException] {
      ZOrder.withZValue(df.withColumn("__z", lit(1)), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      ZOrderExpr(Seq.empty, 8)
    }
  }
}
