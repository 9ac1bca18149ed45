package graft.spark

import graft.pipeline.{Dsir, QualityClassifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained hashed-ngram logistic quality classifier (CCNet/GPT-3-style). */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  private val rnd = new scala.util.Random(31)
  private val goodWords = Seq("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "garden", "tree")
  private val junkWords = Seq("zxq", "wvv", "kpp", "qqj", "xxz", "vbv", "jjq",
    "zzt", "qvx", "ppw")
  private def sentence(words: Seq[String], n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")

  test("separable corpora train to perfect margins; scoring is scan-local") {
    val pos = docs((1L to 25L).map(i => i -> sentence(goodWords, 5 + rnd.nextInt(10))): _*)
    val neg = docs((1L to 25L).map(i => i -> sentence(junkWords, 5 + rnd.nextInt(10))): _*)
    val model = QualityClassifier.train(pos, neg, "text", buckets = 1 << 12, iters = 40)
    val posScores = pos.select(QualityClassifier.probability(col("text"), model))
      .collect().map(_.getDouble(0))
    val negScores = neg.select(QualityClassifier.probability(col("text"), model))
      .collect().map(_.getDouble(0))
    assert(posScores.forall(_ > 0.5), s"min pos ${posScores.min}")
    assert(negScores.forall(_ < 0.5), s"max neg ${negScores.max}")
    // held-out docs from each vocabulary separate too
    val held = docs((100L, sentence(goodWords, 12)), (101L, sentence(junkWords, 12)))
      .select(col("id"), QualityClassifier.probability(col("text"), model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(held(100L) > 0.5 && held(101L) < 0.5)
    // the scorer never shuffles: no Exchange anywhere in the physical plan
    val plan = pos.select(QualityClassifier.margin(col("text"), model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("PROPERTY: one GD iteration matches a driver-side reference gradient") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val buckets = 256
    def h(g: String): Int = {
      val b = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          b.length, 42L), buckets.toLong).toInt
    }
    def grams(t: String): Seq[String] = {
      val l = t.trim.toLowerCase
      val toks = (if (l.isEmpty) Array("") else l.split("\\s+")).toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val posT = (1 to 12).map(_ => sentence(goodWords, 4 + rnd.nextInt(6)))
    val negT = (1 to 12).map(_ => sentence(junkWords, 4 + rnd.nextInt(6)))
    val lr = 0.5
    val model = QualityClassifier.train(
      docs(posT.zipWithIndex.map { case (t, i) => i.toLong -> t }: _*),
      docs(negT.zipWithIndex.map { case (t, i) => i.toLong -> t }: _*),
      "text", buckets = buckets, iters = 1, lr = lr, l2 = 0.0)
    // reference: w=0 => sigmoid=0.5, r = 0.5 - y; grad_b = sum r*x_b
    val n = (posT.size + negT.size).toDouble
    val refW = new Array[Double](buckets)
    var refB = 0.0
    def accum(t: String, y: Double): Unit = {
      val r = 0.5 - y
      grams(t).foreach(g => refW(h(g)) -= lr * r / n)
      refB -= lr * r / n
    }
    posT.foreach(accum(_, 1.0))
    negT.foreach(accum(_, 0.0))
    model.weights.zip(refW).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-12, s"bucket $i: $a vs $b")
    }
    assert(math.abs(model.bias - refB) < 1e-12)
  }

  test("probability is sigmoid(margin) and margin agrees with Dsir.dsirWeight + bias") {
    val model = QualityClassifier.Model(Array.tabulate(64)(i => (i % 7) * 0.1 - 0.3), 0.25)
    val d = docs((1L, "some words to hash into buckets"), (2L, ""))
    val rows = d.select(
      QualityClassifier.margin(col("text"), model).as("m"),
      QualityClassifier.probability(col("text"), model).as("p"),
      (Dsir.dsirWeight(col("text"), model.weights) + lit(model.bias)).as("m2"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0 / (1.0 + math.exp(-r.getDouble(0)))) < 1e-12)
    }
  }
}
