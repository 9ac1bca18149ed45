package graft.spark

import graft.pipeline.{Mixing, Sampling, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keyword retrieval (postings / keyword / BM25 top-k) and deterministic
  * source mixing. BM25 is checked differentially against a driver-side
  * naive scorer (its double score sums per-term contributions, so the
  * DuckDB hash oracle is out per the no-raw-doubles rule). */
class SearchSpec extends AnyFunSuite {

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

  private def queries(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("qid", "qtext")
  }

  private val corpus = Seq(
    1L -> "spark shuffle join window agg spark spark",
    2L -> "join window join filter scan",
    3L -> "the the the the common common",
    4L -> "vector hash stream key vector",
    5L -> "spark join",
    6L -> "") // empty doc: no postings, excluded everywhere

  // ---------------------------------------------------------------- postings

  test("postings and docFrequencies: tf/df from whitespace tokens, empty docs excluded") {
    val d = docs(corpus: _*)
    val p = Search.postings(d, "id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p.contains(("spark", 1L, 3L)))
    assert(p.contains(("join", 2L, 2L)))
    assert(!p.exists(_._2 == 6L)) // empty doc contributes nothing
    val byTok = Search.docFrequencies(d, "id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byTok("spark") === ((2L, 4L)))  // docs 1 and 5; tf 3 + 1
    assert(byTok("join") === ((3L, 4L)))   // docs 1, 2, 5; tf 1 + 2 + 1
  }

  test("prunePostings drops tokens above maxDf") {
    val d = docs(corpus: _*)
    val p = Search.prunePostings(Search.postings(d, "id", "text"), maxDf = 2)
    val toks = p.select("token").distinct().collect().map(_.getString(0)).toSet
    assert(toks.contains("spark")) // df 2
    assert(!toks.contains("join")) // df 3 pruned
  }

  // ------------------------------------------------------------- keyword topk

  test("keywordTopK ranks by (matched terms, matched tf), doc id tiebreak") {
    val d = docs(corpus: _*)
    val q = queries(10L -> "spark join")
    val got = Search.keywordTopK(d, q, "id", "text", "qid", "qtext", k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: 2 terms, tf 3+1=4; doc 5: 2 terms, tf 2; doc 2: 1 term, tf 2
    assert(got.toSeq === Seq((1, 1L, 2L, 4L), (2, 5L, 2L, 2L), (3, 2L, 1L, 2L)))
  }

  test("keywordTopK: duplicate query terms count once; broadcast plan") {
    val d = docs(corpus: _*)
    val q = queries(10L -> "spark spark spark")
    val ranked = Search.keywordTopK(d, q, "id", "text", "qid", "qtext", k = 3)
    val got = ranked.collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(1L -> 1L, 5L -> 1L)) // matched_terms 1 despite tf-3 query
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "query tokens must broadcast against postings")
  }

  test("PROPERTY: keywordTopK matches a naive scorer on random corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def text(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (trial <- 0 until 3) {
      val corp = (0L until 60L).map(i => (i, text(rnd.nextInt(20) + 1)))
      val qs = (100L until 103L).map(i => (i, text(3)))
      val k = 7
      val got = Search.keywordTopK(docs(corp: _*), queries(qs: _*),
          "id", "text", "qid", "qtext", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
        .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3) }
      val expected = qs.map { case (qid, qt) =>
        val qTerms = qt.split("\\s+").distinct.toSeq
        val scored = corp.flatMap { case (did, dt) =>
          val tf = dt.split("\\s+").groupBy(identity).map { case (w, g) => w -> g.size }
          val matched = qTerms.count(tf.contains)
          val mtf = qTerms.flatMap(tf.get).sum
          if (matched > 0) Some((did, matched.toLong * 1000000000L + mtf)) else None
        }
        qid -> scored.sortBy { case (did, sc) => (-sc, did) }.take(k).map(_._1)
      }.toMap
      assert(got === expected, s"trial $trial")
    }
  }

  // ------------------------------------------------------------------- bm25

  /** Naive driver-side BM25 with the same tokenization and idf. */
  private def naiveBm25(corp: Seq[(Long, String)], qs: Seq[(Long, String)],
                        k1: Double = 1.2, b: Double = 0.75): Map[(Long, Long), Double] = {
    def tok(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val tfs = corp.map { case (id, t) =>
      id -> tok(t).groupBy(identity).map { case (w, g) => w -> g.size }
    }.toMap
    val dls = corp.map { case (id, t) => id -> tok(t).size }.filter(_._2 > 0).toMap
    val n = dls.size
    val avgdl = dls.values.sum.toDouble / n
    val dfm = tfs.values.flatMap(_.keys).groupBy(identity).map { case (w, g) => w -> g.size }
    (for {
      (qid, qt) <- qs
      term <- tok(qt).distinct
      (did, tf) <- tfs
      f <- tf.get(term)
    } yield {
      val df = dfm(term)
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val contrib = idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dls(did) / avgdl))
      (qid, did) -> contrib
    }).groupBy(_._1).map { case (key, g) => key -> g.map(_._2).sum }
  }

  test("bm25TopK matches a naive reference scorer (differential)") {
    val d = docs(corpus: _*)
    val qs = Seq(10L -> "spark join", 11L -> "vector stream", 12L -> "common scan")
    val q = queries(qs: _*)
    val expected = naiveBm25(corpus, qs)
    val got = Search.bm25TopK(d, q, "id", "text", "qid", "qtext", k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (key, score) =>
      assert(math.abs(score - expected(key)) < 1e-9, s"score mismatch at $key")
    }
    // rank order agrees with the reference where gaps are clear
    val gotRanks = Search.bm25TopK(d, q, "id", "text", "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (qid, rs) => qid -> rs.sortBy(_._2).map(_._3).toSeq }
    val expRanks = expected.toSeq.groupBy(_._1._1).map { case (qid, g) =>
      qid -> g.sortBy { case ((_, did), s) => (-s, did) }.map(_._1._2).toSeq
    }
    assert(gotRanks === expRanks)
  }

  test("PROPERTY: bm25TopK matches the naive scorer on random corpora") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("red", "blue", "green", "gold", "black", "white", "gray")
    def text(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (trial <- 0 until 2) {
      val corp = (0L until 40L).map(i => (i, text(rnd.nextInt(15) + 2)))
      val qs = (100L until 103L).map(i => (i, text(2)))
      val expected = naiveBm25(corp, qs)
      val got = Search.bm25TopK(docs(corp: _*), queries(qs: _*),
          "id", "text", "qid", "qtext", k = 50)
        .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
      assert(got.keySet === expected.keySet, s"trial $trial")
      got.foreach { case (key, s) =>
        assert(math.abs(s - expected(key)) < 1e-9, s"trial $trial score at $key")
      }
    }
  }

  test("bm25TopK on an empty corpus returns empty, not an NPE") {
    // sum(dl) over zero docs is SQL NULL — the scalar collect must not
    // getLong it; the correct answer is simply no candidates
    val d = docs()
    val q = queries(10L -> "spark join")
    assert(Search.bm25TopK(d, q, "id", "text", "qid", "qtext", k = 5).count() === 0)
  }

  test("bm25TopK honors maxDf pruning") {
    val d = docs(corpus: _*)
    val q = queries(10L -> "the spark")
    // "the" has df 1 but tf 4; with maxDf pruning at df >= 1 nothing changes
    // for it; instead prune "join"-like common terms: use maxDf = 2 and a
    // query containing the df-3 term "join" — it must contribute nothing
    val q2 = queries(20L -> "join vector")
    val got = Search.bm25TopK(d, q2, "id", "text", "qid", "qtext", k = 10, maxDf = 2)
      .collect().map(r => r.getLong(2)).toSet
    assert(got === Set(4L)) // only the "vector" doc survives; join-docs pruned
  }

  // ------------------------------------------------------------------ mixing

  test("mixRates and mixToBudget: budget-proportional deterministic keep") {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map { i =>
      val src = s"s${i % 3}"
      (i.toLong, src, "tok " * (i % 7 + 1) + "end")
    }
    val d = rows.toDF("id", "source", "text")
    val shares = Map("s0" -> 0.6, "s1" -> 0.4) // s2 unshared -> dropped
    val totals = Mixing.sourceTokenTotals(d, "source", "text").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val budget = 600L
    val rates = Mixing.mixRates(d, "source", "text", shares, budget)
    assert(rates.keySet === Set("s0", "s1"))
    assert(math.abs(rates("s0") - math.min(1.0, 0.6 * 600.0 / totals("s0"))) < 1e-15)
    val kept = Mixing.mixToBudget(d, "id", "source", "text", shares, budget)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("s2"))
    // exact reproducibility: the md5 rule picks precisely these rows
    val expectedIds = rows.filter { case (id, src, _) =>
      rates.get(src).exists { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 < r
      }
    }.map(_._1).toSet
    val gotIds = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds === expectedIds)
    assert(gotIds.nonEmpty)
  }

  test("mixRates: an all-null-text source totals zero tokens, never NPEs") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "good", Option("tok tok end")),
      (2L, "good", Option("more text here")),
      (3L, "broken", Option.empty[String]), // a feed that lost its text column
      (4L, "broken", Option.empty[String]))
      .toDF("id", "source", "text")
    val totals = Mixing.sourceTokenTotals(d, "source", "text").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(totals("broken") === 0L)
    // zero-token source: no keep rate derivable (min(1, share*B/0) has no
    // meaning) — it simply contributes nothing, and the job must not crash
    val rates = Mixing.mixRates(d, "source", "text",
      Map("good" -> 0.5, "broken" -> 0.5), budgetTokens = 100L)
    assert(rates.contains("good"))
  }

  test("temperatureShares rejects a zero-mass corpus instead of NaN shares") {
    val s = spark
    import s.implicits._
    // every source totals zero tokens (all-null texts — note "" counts as
    // ONE token under the repo tokenizer idiom, matching the oracle):
    // 0/0 would yield NaN shares that silently poison every mixing rate
    val d = Seq((1L, "a", null.asInstanceOf[String]),
        (2L, "b", null.asInstanceOf[String]))
      .toDF("id", "source", "text")
    val err = intercept[IllegalArgumentException](
      Mixing.temperatureShares(d, "source", "text", temperature = 2.0))
    assert(err.getMessage.contains("zero tokens"))
    // an EMPTY corpus has no sources at all — empty shares, no crash
    assert(Mixing.temperatureShares(d.where(lit(false)), "source", "text", 2.0).isEmpty)
  }

  test("temperatureShares: T=1 natural, T->inf uniform, monotone flattening") {
    val s = spark
    import s.implicits._
    // token masses 10 : 30 : 60 across three sources
    val rows = (0 until 100).flatMap { i =>
      val (src, n) = if (i < 10) ("small", 10) else if (i < 40) ("mid", 10) else ("big", 10)
      Seq((i.toLong, src, ("w " * (n - 1)) + "w"))
    }
    val d = rows.toDF("id", "source", "text")
    val t1 = Mixing.temperatureShares(d, "source", "text", temperature = 1.0)
    assert(math.abs(t1("small") - 0.1) < 1e-12)
    assert(math.abs(t1("mid") - 0.3) < 1e-12)
    assert(math.abs(t1("big") - 0.6) < 1e-12)
    val t100 = Mixing.temperatureShares(d, "source", "text", temperature = 100.0)
    t100.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 0.01))
    // flattening is monotone in T: the small source's share only grows
    val t33 = Mixing.temperatureShares(d, "source", "text", temperature = 3.3)
    assert(t1("small") < t33("small") && t33("small") < t100("small"))
    assert(t1("big") > t33("big") && t33("big") > t100("big"))
    assert(math.abs(t33.values.sum - 1.0) < 1e-12)
    // and the shares drop straight into the budget filter
    val kept = Mixing.mixToBudget(d, "id", "source", "text", t33, budgetTokens = 400L)
    assert(kept.count() > 0)
  }

  test("mixToBudget with ample budget keeps every shared-source row") {
    val s = spark
    import s.implicits._
    val d = (0 until 50).map(i => (i.toLong, s"s${i % 2}", "a b c"))
      .toDF("id", "source", "text")
    val kept = Mixing.mixToBudget(d, "id", "source", "text",
      Map("s0" -> 1.0, "s1" -> 1.0), budgetTokens = 1000000L)
    assert(kept.count() === 50)
    val rates = Mixing.mixRates(d, "source", "text", Map("s0" -> 1.0), 1000000L)
    assert(rates("s0") === 1.0)
  }

  test("phraseHits: consecutive-token matches incl. overlapping and repeated words") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),       // one "quick brown"
      (2L, "quick brown quick brown"),   // two
      (3L, "brown quick"),               // reversed: none
      (4L, "a a a"),                     // overlapping "a a": two
      (5L, "")                           // empty doc
    ).toDF("doc_id", "text")
    val qs = Seq((10, "quick brown"), (20, "a a"), (30, "missing phrase"))
      .toDF("q_id", "q_text")
    val got = Search.phraseHits(docs, qs, "doc_id", "text", "q_id", "q_text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((10, 1L) -> 1L, (10, 2L) -> 2L, (20, 4L) -> 2L))
  }

  test("PROPERTY: phraseHits matches a naive sliding-window count on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(97)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val phrases = Seq((1, "a b"), (2, "b b"), (3, "c a d"), (4, "a a"))
    def naive(text: String, phrase: String): Long = {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      val p = phrase.trim.toLowerCase.split("\\s+").toSeq
      (0 to t.length - p.length).count(i => t.slice(i, i + p.length) == p).toLong
    }
    val expect = (for ((qid, ph) <- phrases; (did, text) <- docs;
                       n = naive(text, ph) if n > 0) yield (qid, did) -> n).toMap
    val got = Search.phraseHits(docs.toDF("doc_id", "text"),
        phrases.toDF("q_id", "q_text"), "doc_id", "text", "q_id", "q_text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }
}
