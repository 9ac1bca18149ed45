package graft.spark

import graft.pipeline.{Quantize, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 embedding quantization: reconstruction error bound, degenerate
  * vectors, code range, and serving-path top-k fidelity. */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randomVecs(n: Int, d: Int, seed: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(d)(rnd.nextFloat() * 4 - 2)))
      .toDF("vec_id", "embedding")
  }

  test("round-trip error bounded by qscale/2; codes within 0..255") {
    val df = randomVecs(200, 16, seed = 3)
    val q = Quantize.quantizeAll(df, "vec_id", "embedding")
    val joined = q.join(df, col("id") === col("vec_id"))
      .select(col("qscale"), col("codes"),
        Quantize.dequantize(struct(col("qmin"), col("qscale"), col("codes"))).as("deq"),
        transform(col("embedding"), _.cast("double")).as("orig"))
    joined.collect().foreach { r =>
      val qscale = r.getDouble(0)
      val codes = r.getSeq[Int](1)
      val deq = r.getSeq[Double](2)
      val orig = r.getSeq[Double](3)
      assert(codes.forall(c => c >= 0 && c <= 255))
      orig.zip(deq).foreach { case (x, y) =>
        assert(math.abs(x - y) <= qscale / 2 * (1 + 1e-9),
          s"error ${math.abs(x - y)} > ${qscale / 2}")
      }
    }
  }

  test("degenerate constant vector: zero codes, exact dequantize") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.25f, 0.25f, 0.25f))).toDF("vec_id", "embedding")
    val q = Quantize.quantizeAll(df, "vec_id", "embedding")
    val r = q.select(col("qscale"), col("codes"),
        Quantize.dequantize(struct(col("qmin"), col("qscale"), col("codes"))).as("deq"))
      .head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getSeq[Int](1).forall(_ === 0))
    assert(r.getSeq[Double](2).forall(_ === 0.25f.toDouble))
  }

  test("quantized top-k: planted copies stay rank 1; high agreement with exact") {
    val base = randomVecs(300, 24, seed = 9)
    val queries = base.where(col("vec_id") < 8)
    val corpus = base.unionByName(
      queries.withColumn("vec_id", col("vec_id") + 1000L))
    val qCorpus = Quantize.quantizeAll(corpus, "vec_id", "embedding")
    val got = Quantize.quantizedTopK(qCorpus, queries, "vec_id", "embedding", k = 5)
    // the planted identical copy survives 8-bit rounding as the top hit
    val top1 = got.where(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 8L).foreach(q => assert(top1(q) === q + 1000L, s"query $q top-1"))
    // agreement with the exact float path on the full top-5 sets
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall too low: $recall")
  }
}
