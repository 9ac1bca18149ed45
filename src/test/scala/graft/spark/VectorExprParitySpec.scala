package graft.spark

import graft.pipeline.{sketches, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gates for the r11 single-pass vector primitives: the optimized
  * expressions must be BIT-identical to the builtin formulations they
  * replaced (the DuckDB oracle pins query outputs; these pin the building
  * blocks on adversarial inputs the corpus doesn't exercise). */
class VectorExprParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The pre-r11 builtin cosine (three HOF traversals) — the reference. */
  private def cosineBuiltin(a: org.apache.spark.sql.Column,
                            b: org.apache.spark.sql.Column) = {
    val prods = zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))
    val dot = aggregate(prods, lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  test("CosineSimExpr is bit-identical to the builtin formulation, " +
       "including null / zero-norm / length-mismatch cases") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      Seq.tabulate(200) { i =>
        def vec(n: Int) = Seq.fill(n)(java.lang.Double.valueOf(rnd.nextGaussian()))
        i % 10 match {
          case 7 => (vec(8), vec(6))                       // length mismatch
          case 8 => (Seq.fill(8)(java.lang.Double.valueOf(0.0)), vec(8)) // zero norm
          case 9 => (null, vec(8))                         // null array
          case _ => (vec(8), vec(8))
        }
      }
    val df = rows.toDF("a", "b")
    val got = df.select(
      sketches.cosineSim(col("a"), col("b")).as("fast"),
      cosineBuiltin(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null-ness diverged: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bits diverged: $r")
    }
  }

  test("EuclidDistExpr is bit-identical to the sqrt(aggregate(zip_with)) " +
       "formulation, including null and ragged rows") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val center = Array.fill(6)(rnd.nextGaussian())
    val c = typedLit(center.toIndexedSeq)
    val rows: Seq[Seq[java.lang.Double]] = Seq.tabulate(100) { i =>
      i % 8 match {
        case 6 => Seq.fill(4)(java.lang.Double.valueOf(rnd.nextGaussian())) // ragged
        case 7 => null
        case _ => Seq.fill(6)(java.lang.Double.valueOf(rnd.nextGaussian()))
      }
    }
    val df = rows.toDF("v")
    val ref = sqrt(aggregate(
      zip_with(col("v"), c, (v, m) => (v.cast("double") - m) * (v.cast("double") - m)),
      lit(0.0), (acc, x) => acc + x))
    val got = df.select(
      sketches.euclidDist(col("v"), center.toIndexedSeq).as("fast"),
      ref.as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null-ness diverged: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bits diverged: $r")
    }
  }

  test("vecDimStats means are bit-identical to the posexplode + " +
       "groupBy(pos) decimal formulation, under repartitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(500)(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
      .toDF("id", "vec").repartition(7)
    val ref = df.select(posexplode(col("vec")))
      .groupBy("pos")
      .agg((sum(col("col").cast("decimal(38,15)")) / count(lit(1)))
        .cast("double").as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val fast = df.agg(sketches.vecDimStats(col("vec")).as("st"))
      .select(sketches.vecDimMeans(col("st"))).head().getSeq[Double](0)
    assert(fast.length === ref.length)
    fast.zip(ref).foreach { case (f, r) =>
      assert(java.lang.Double.doubleToRawLongBits(f) ===
        java.lang.Double.doubleToRawLongBits(r))
    }
  }

  test("vecDimStats handles integral element types with exact long->decimal " +
       "semantics (no double round-trip)") {
    val s = spark
    import s.implicits._
    // 2^53 + 1 is not representable as a double — the exact path must keep it
    val big = (1L << 53) + 1L
    val df = Seq(Seq(big, 1L), Seq(big, 3L)).toDF("vec")
    val mean = df.agg(sketches.vecDimStats(col("vec")).as("st"))
      .select(sketches.vecDimMeans(col("st"))).head().getSeq[Double](0)
    assert(mean(0) === big.toDouble) // (2*(2^53+1))/2 cast double
    assert(mean(1) === 2.0)
  }

  test("CosineSimExpr / EuclidDistExpr accept decimal arrays with " +
       "cast-to-double parity (r12: decimal arm added to VecGetter)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Seq(BigDecimal("1.25"), BigDecimal("-2.50")),
       Seq(BigDecimal("0.75"), BigDecimal("4.00"))),
      (Seq(BigDecimal("0.00"), BigDecimal("0.00")),
       Seq(BigDecimal("1.00"), BigDecimal("1.00"))))
    val df = rows.toDF("a", "b")
    val got = df.select(
      sketches.cosineSim(col("a"), col("b")).as("fast"),
      cosineBuiltin(col("a"), col("b")).as("ref"),
      sketches.euclidDist(col("a"), Seq(1.0, 1.0)).as("dFast"),
      sqrt(aggregate(
        zip_with(col("a"), typedLit(Seq(1.0, 1.0)),
          (v, m) => (v.cast("double") - m) * (v.cast("double") - m)),
        lit(0.0), (acc, x) => acc + x)).as("dRef")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("vector expressions fail at ANALYSIS time on unsupported element " +
       "types (r12: was a lazy per-task IllegalArgumentException)") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("x", "y"), Seq("a", "b"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(sketches.cosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("lloydRefine-backed kmeans tolerates a null embedding row " +
       "(dropped, as the posexplode formulation dropped it)") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.0)),
      (2L, Seq[java.lang.Double](0.9, 0.1)),
      (3L, Seq[java.lang.Double](0.0, 1.0)),
      (4L, null))
    val df = rows.toDF("id", "vec")
    val (centroids, assigned) = Similarity.kmeans(df, "id", "vec", k = 2, iters = 2)
    assert(centroids.length === 2)
    // the null row keeps its (null) assignment but must not crash the build
    assert(assigned.count() === 4)
  }
}
