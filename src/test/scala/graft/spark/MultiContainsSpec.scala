package graft.spark

import graft.pipeline.MultiContains
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick multi-pattern containment: randomized differential vs the
  * naive String.contains chain, plus the classic overlap traps (patterns
  * that are prefixes/suffixes/substrings of each other). */
class MultiContainsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(texts: Seq[String], patterns: Seq[String]): Seq[Seq[Int]] = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), MultiContains.matchedIndices(col("t"), patterns).as("m"))
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq).toSeq
  }

  test("overlapping patterns: prefixes, suffixes, nested, fail-link hits") {
    val patterns = Seq("ab", "babc", "bc", "abcd", "c")
    val texts = Seq(
      "babc",   // hits: babc, ab (at 1), bc (at 2), c
      "abcd",   // ab, bc, abcd, c
      "xyz",    // none
      "cab")    // c, ab
    val got = run(texts, patterns)
    def naive(t: String) = patterns.zipWithIndex.collect {
      case (p, i) if t.contains(p) => i }
    assert(got === texts.map(naive))
  }

  test("PROPERTY: differential vs contains-chain on random texts/patterns") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc"
    def randStr(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 5) {
      val patterns = (0 until 30).map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val texts = (0 until 60).map(_ => randStr(rnd.nextInt(40)))
      val got = run(texts, patterns)
      val expected = texts.map(t => patterns.zipWithIndex.collect {
        case (p, i) if t.contains(p) => i })
      assert(got === expected, s"trial $trial")
    }
  }

  test("unicode outside the BMP matches like contains") {
    val patterns = Seq("日本語", "😀😀", "a😀b")
    val texts = Seq("this is 日本語 text", "emoji 😀😀 pair", "x a😀b y", "plain")
    val got = run(texts, patterns)
    val expected = texts.map(t => patterns.zipWithIndex.collect {
      case (p, i) if t.contains(p) => i })
    assert(got === expected)
  }
}
