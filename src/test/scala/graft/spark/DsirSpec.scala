package graft.spark

import graft.pipeline.Dsir
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (Xie et al. 2023): exact-gram binarized
  * votes, hashed log-ratio weights, deterministic Gumbel top-k. */
class DsirSpec extends AnyFunSuite {

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

  // driver-side reference: tokenize + grams exactly as the operator defines
  private def refGrams(t: String): Seq[String] = {
    val l = t.trim.toLowerCase
    val toks = (if (l.isEmpty) Array("") else l.split("\\s+")).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }

  private def refVotes(raw: Seq[(Long, String)], target: Seq[String])
      : Map[Long, (Long, Long)] = {
    val rg = raw.flatMap { case (id, t) => refGrams(t).map(id -> _) }
    val cR = rg.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    val tgtGrams = target.flatMap(refGrams)
    val cT = tgtGrams.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val v = (cR.keySet ++ cT.keySet).size.toLong
    val nR = rg.size.toLong
    val nT = tgtGrams.size.toLong
    def vote(g: String): Int = {
      val lhs = (cT.getOrElse(g, 0L) + 1) * (nR + v)
      val rhs = (cR.getOrElse(g, 0L) + 1) * (nT + v)
      if (lhs > rhs) 1 else if (lhs < rhs) -1 else 0
    }
    rg.groupBy(_._1).map { case (id, gs) =>
      id -> (gs.count(x => vote(x._2) == 1).toLong, gs.count(x => vote(x._2) == -1).toLong)
    }
  }

  test("gramHashes parity with xxhash64 over the gram strings") {
    val s = spark
    import s.implicits._
    val texts = Seq("the cat sat", "  MiXeD Case  words ", "one", "",
      "a b c d e f g")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(Dsir.gramHashes(col("text")).as("fast"),
        transform(Dsir.gramInstances(col("text")), g => xxhash64(g)).as("builtin"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      }
  }

  test("voteScores: hand-computed fixture") {
    val raw = docs((1L, "cat dog"), (2L, "fish fish"))
    val target = docs((10L, "cat dog"))
    val got = Dsir.voteScores(raw, target, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // V=5 grams, N_r=6, N_t=3: every doc-1 gram instance is target-heavier,
    // every doc-2 instance raw-heavier (fish twice + "fish fish")
    assert(got.toSeq === Seq((1L, 3L, 0L, 3L), (2L, 0L, 3L, -3L)))
  }

  test("PROPERTY: voteScores matches the driver-side reference on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocabA = Seq("alpha", "beta", "gamma", "delta")
    val vocabB = Seq("kappa", "lambda", "mu", "nu")
    for (_ <- 1 to 3) {
      val raw = (1L to 40L).map { id =>
        val vocab = if (rnd.nextBoolean()) vocabA else vocabB
        id -> Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val target = Seq.fill(8)(
        Seq.fill(3)(vocabA(rnd.nextInt(vocabA.size))).mkString(" "))
      val want = refVotes(raw, target)
      val got = Dsir.voteScores(raw.toDF("id", "text"),
          target.map(t => (0L, t)).toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === want)
    }
  }

  test("PROPERTY: logWeights matches a driver-side reference (hash included)") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def h(g: String): Long = {
      val b = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    val buckets = 64
    val rnd = new scala.util.Random(11)
    val words = Seq("the", "cat", "sat", "on", "a", "mat", "dog", "ran")
    val raw = (1L to 30L).map(id =>
      id -> Seq.fill(1 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    val target = raw.take(10).map(_._2)
    val s = spark
    import s.implicits._
    val rawDf = raw.toDF("id", "text")
    val tgtDf = target.map((0L, _)).toDF("id", "text")
    val lambdas = Dsir.logRatios(rawDf, tgtDf, "text", buckets)
    // reference histograms + weights
    def hist(texts: Seq[String]): Array[Long] = {
      val a = new Array[Long](buckets)
      texts.flatMap(refGrams).foreach(g => a(java.lang.Math.floorMod(h(g), buckets.toLong).toInt) += 1)
      a
    }
    val rh = hist(raw.map(_._2)); val th = hist(target)
    val nR = rh.sum.toDouble + buckets; val nT = th.sum.toDouble + buckets
    val wantLambda = Array.tabulate(buckets)(b =>
      math.log((th(b) + 1.0) / nT) - math.log((rh(b) + 1.0) / nR))
    assert(lambdas.zip(wantLambda).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val got = Dsir.logWeights(rawDf, "id", "text", lambdas)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    raw.foreach { case (id, t) =>
      val want = refGrams(t).map(g =>
        wantLambda(java.lang.Math.floorMod(h(g), buckets.toLong).toInt)).sum
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id")
    }
  }

  test("resampleTopK: deterministic under repartition, bounded by k, prefers target-like docs") {
    val s = spark
    import s.implicits._
    // 30 target-like docs (ids 1-30), 30 off-domain (ids 31-60)
    val raw = ((1L to 30L).map(id => id -> "alpha beta gamma alpha beta") ++
      (31L to 60L).map(id => id -> "zeta eta theta zeta eta")).toDF("id", "text")
    val tgt = Seq((0L, "alpha beta gamma")).toDF("id", "text")
    val lambdas = Dsir.logRatios(raw, tgt, "text", buckets = 256)
    val sel = Dsir.resampleTopK(raw, "id", "text", lambdas, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sel.size === 10)
    // the weight gap dominates the Gumbel noise here: all picks are target-like
    assert(sel.forall(_ <= 30L), s"off-domain docs selected: ${sel.filter(_ > 30L)}")
    val again = Dsir.resampleTopK(raw.repartition(7), "id", "text", lambdas, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === sel)
  }
}
