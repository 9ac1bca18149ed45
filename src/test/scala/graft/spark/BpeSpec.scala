package graft.spark

import graft.pipeline.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned BPE tokenization (Sennrich et al. 2016): driver-side merge
  * training on a bounded dictionary, scan-local application. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the classic dictionary from the BPE paper's running example
  private val dict = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainFromCounts learns the canonical merge sequence on the paper dictionary") {
    val model = Bpe.trainFromCounts(dict, numMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t</w>)=9, (w,e)=8, (l,o)=7 ... tie
    // breaks to the lexicographically smaller pair
    assert(model.merges.head === (("e", "s")))
    assert(model.merges(1) === (("es", "t</w>")))  // 9 again, now adjacent
    // "newest" and "widest" now both end in one est</w> symbol
    assert(Bpe.applyWord("newest", model).last === "est</w>")
    assert(Bpe.applyWord("widest", model).last === "est</w>")
  }

  test("zero merges = code points per word; merges only shrink counts") {
    val s = spark
    import s.implicits._
    val texts = Seq((1L, "low lower newest widest"), (2L, "héllo ☃ snow"),
      (3L, ""), (4L, "newest newest newest"))
    val df = texts.toDF("id", "text")
    val zero = Bpe.Model(Seq.empty)
    val got0 = df.select(col("id"), Bpe.tokenCount(col("text"), zero).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // per word: #codepoints (the </w> sentinel merges into the last char)
    assert(got0(1L) === "lowlowernewestwidest".length)
    assert(got0(2L) === "héllo".codePointCount(0, 5) + 1 + 4)
    assert(got0(3L) === 0) // tokenize("") -> [""] -> zero symbols
    assert(got0(4L) === 18)
    // monotone: counts never grow as the model learns more merges
    val counts = (0 to 8 by 2).map { m =>
      val model = Bpe.trainFromCounts(dict, m)
      df.select(sum(Bpe.tokenCount(col("text"), model))).head.getLong(0)
    }
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(counts.last < counts.head)
  }

  test("sampleAndTrain end-to-end: deterministic, bounded dictionary, applies scan-locally") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 200L).map { i =>
      (i, if (i % 2 == 0) "the newest widest lowest tokens appear here often"
          else "lower slower flower tower shower power")
    }.toDF("id", "text")
    val m1 = Bpe.sampleAndTrain(corpus, "id", "text", numMerges = 30)
    val m2 = Bpe.sampleAndTrain(corpus.repartition(7), "id", "text", numMerges = 30)
    assert(m1.merges === m2.merges, "training must not depend on layout")
    // frequent suffixes compress: "er</w>" ends up a single symbol
    assert(m1.merges.exists { case (a, b) => (a + b).endsWith("er</w>") })
    val counted = corpus.select(Bpe.tokenCount(col("text"), m1).as("n"))
      .agg(sum("n")).head.getLong(0)
    val whitespace = corpus.select(
      graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(sum(col("n").cast("long"))).head.getLong(0)
    assert(counted > whitespace, "subword tokens outnumber whitespace words")
    // tokens() round-trip: concatenating pieces re-spells each word
    val pieces = Seq((1L, "newest lower")).toDF("id", "text")
      .select(Bpe.tokens(col("text"), m1)).head.getSeq[String](0)
    assert(pieces.mkString("").replace(Bpe.EndOfWord, "") === "newestlower")
    assert(pieces.count(_.endsWith(Bpe.EndOfWord)) === 2) // one boundary per word
    // sampling changes the dictionary but stays deterministic
    val mS = Bpe.sampleAndTrain(corpus, "id", "text", numMerges = 10, sampleFraction = 0.3)
    val mS2 = Bpe.sampleAndTrain(corpus, "id", "text", numMerges = 10, sampleFraction = 0.3)
    assert(mS.merges === mS2.merges)
  }

  test("Curation budgets count in BPE units when a model is configured") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    val corpus = (1L to 40L).map(i => (i, "newest widest lowest")).toDF("id", "text")
    val model = Bpe.sampleAndTrain(corpus, "id", "text", numMerges = 0)
    // 18 BPE symbols/doc (zero merges = codepoints) vs 3 whitespace words:
    // a 90-token budget keeps ~30 docs by whitespace but ~5 by BPE
    val bpeKept = Curation.run(corpus, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false, tokenBudget = Some(90L),
        bpeModel = Some(model)), trackFunnel = false).docs.count()
    val wsKept = Curation.run(corpus, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false, tokenBudget = Some(90L)),
      trackFunnel = false).docs.count()
    assert(bpeKept === 5L)
    assert(wsKept === 30L)
  }
}
