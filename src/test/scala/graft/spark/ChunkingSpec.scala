package graft.spark

import graft.pipeline.Chunking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Within-document sliding-window chunking: pinned golden windows, full
  * token coverage on random docs, and the no-pure-suffix window rule. */
class ChunkingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Int, Int, Int, String)] = {
    val s = spark
    import s.implicits._
    Chunking.slidingWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_token", "chunk_tokens", "chunk_text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
  }

  test("golden: 10 tokens, size 4, stride 2") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(chunksOf(text, size = 4, stride = 2) === Seq(
      (0, 0, 4, "w1 w2 w3 w4"),
      (1, 2, 4, "w3 w4 w5 w6"),
      (2, 4, 4, "w5 w6 w7 w8"),
      (3, 6, 4, "w7 w8 w9 w10")))
  }

  test("golden: short doc yields one whole-doc window; trailing suffix dropped") {
    assert(chunksOf("a b c", size = 8, stride = 4) === Seq((0, 0, 3, "a b c")))
    // n=10, size=8, stride=4: start 8 would be a pure suffix of [4:10) — dropped
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(chunksOf(text, size = 8, stride = 4).map(c => (c._2, c._3)) ===
      Seq((0, 8), (4, 6)))
  }

  test("empty and whitespace-only docs produce no chunks") {
    val s = spark
    import s.implicits._
    val out = Chunking.slidingWindows(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", size = 4, stride = 2)
    assert(out.count() === 0)
  }

  test("property: every token covered, windows bounded, reconstruction (randomized)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(50)
      val size = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(size)
      val toks = (0 until n).map(i => s"t$i")
      val got = chunksOf(toks.mkString(" "), size, stride)
      // chunk_idx is dense 0..k-1 and starts are stride multiples
      assert(got.map(_._1) === got.indices.toSeq, s"trial $trial")
      got.foreach { case (idx, start, len, text) =>
        assert(start === idx * stride)
        assert(len === math.min(size, n - start))
        assert(text === toks.slice(start, start + size).mkString(" "),
          s"trial $trial window $idx")
      }
      // full coverage: union of [start, start+len) is exactly [0, n)
      val covered = got.flatMap { case (_, start, len, _) => start until (start + len) }.toSet
      assert(covered === (0 until n).toSet, s"trial $trial coverage")
      // no pure-suffix windows: each non-first window adds new tokens
      got.sliding(2).foreach {
        case Seq((_, s1, l1, _), (_, s2, l2, _)) =>
          assert(s2 + l2 > s1 + l1, s"trial $trial suffix window")
        case _ =>
      }
    }
  }
}
