package graft.spark

import graft.pipeline.{Decontaminate, Dedup, Lines}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5e curation operators: corpus-global segment dedup with
  * reconstruction, n-gram novelty, fuzzy (Jaccard) decontamination, and
  * quality-aware canonical selection. */
class LinesSpec extends AnyFunSuite {

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

  // --------------------------------------------------------- dedupSegments

  test("dedupSegments drops cross-doc duplicate windows, keeps order") {
    // segSize=2 windows: doc 1 = [a b][c d][e f]; doc 2 = [a b][x y];
    // doc 3 = [c d][z z]. [a b] and [c d] each appear in 2 docs.
    val df = docs(
      (1L, "a b c d e f"),
      (2L, "a b x y"),
      (3L, "c d z z"))
    val out = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 2)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq ===
      Seq((1L, 3, 2, "e f"), (2L, 2, 1, "x y"), (3L, 2, 1, "z z")))
  }

  test("dedupSegments: within-doc repetition does not condemn; full drop -> empty text") {
    // doc 1 repeats [p q] twice but no other doc has it -> survives intact;
    // docs 2 and 3 are identical -> every window condemned, text empties.
    val df = docs(
      (1L, "p q p q"),
      (2L, "m n o r"),
      (3L, "m n o r"))
    val out = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 2)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq ===
      Seq((1L, 2, 0, "p q p q"), (2L, 2, 2, ""), (3L, 2, 2, "")))
  }

  test("dedupSegments: short tail window handled; minDocs=3 spares pairs") {
    val df = docs(
      (1L, "a b c"),   // windows [a b][c] — tail window of 1 token
      (2L, "a b"),
      (3L, "a b"))
    val two = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 2)
      .orderBy("id").collect()
    assert(two.map(r => (r.getLong(0), r.getString(3))).toSeq ===
      Seq((1L, "c"), (2L, ""), (3L, "")))
    val three = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 3)
      .orderBy("id").collect()
    assert(three.map(r => (r.getLong(0), r.getString(3))).toSeq ===
      Seq((1L, "c"), (2L, ""), (3L, "")))  // [a b] is still in 3 docs
    val four = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 4)
      .orderBy("id").collect()
    assert(four.map(_.getString(3)).toSeq === Seq("a b c", "a b", "a b"))
  }

  test("PROPERTY: dedupSegments matches a naive reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val segSize = 3
    def segsOf(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.grouped(segSize).map(_.mkString(" ")).toSeq
    val docCount = rows.flatMap { case (i, t) => segsOf(t).distinct.map(s => (s, i)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).distinct.size) }
    val condemned = docCount.filter(_._2 >= 2).keySet
    val expected = rows.map { case (i, t) =>
      val segs = segsOf(t)
      val kept = segs.filterNot(condemned)
      (i, segs.size, segs.size - kept.size, kept.mkString(" "))
    }
    val got = Lines.dedupSegments(docs(rows: _*), "id", "text", segSize, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got === expected)
  }

  test("dedupSegments: irregular whitespace and empty docs round-trip the rebuild") {
    // multi-space / tab / leading-trailing whitespace: tokenization is
    // \s+ on trimmed text, reconstruction joins with single spaces
    val df = docs(
      (1L, "  a   b\tc  "),  // tokenizes as [a b][c] despite messy spacing
      (2L, ""),
      (3L, "a b x"),         // shares window [a b] with doc 1
      (4L, "q r s"))         // untouched
    val out = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(out === Seq(
      (1L, 2, 1, "c"),      // [a b] condemned (docs 1+3), tail [c] unique
      (2L, 0, 0, ""),
      (3L, 2, 1, "x"),
      (4L, 2, 0, "q r s")))
  }

  test("rebuild tokenizes exactly like the hash side (leading newline must not shift windows)") {
    // Spark-side tokens of doc 1 are ["", foo, bar, baz] (space-only trim
    // keeps the '\n', split keeps the leading empty); the rebuild must see
    // the SAME array or the condemned window index lands one window off
    val df = docs(
      (1L, "\nfoo bar baz"),
      (2L, "x y bar baz"))
    val out = Lines.dedupSegments(df, "id", "text", segSize = 2, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(out === Seq(
      (1L, 2, 1, "foo"),   // [bar baz] condemned — NOT the shifted [baz]
      (2L, 2, 1, "x y")))
    // unaligned spans: same hazard through SpanRemoveExpr
    val spans = Lines.removeDuplicateSpans(
        docs((1L, "\na b c d"), (2L, "z a b")), "id", "text",
        spanLen = 2, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(spans === Seq(
      (1L, 5, 2, "c d"),   // covered tokens are [a, b], not the shifted [b, c]
      (2L, 3, 2, "z")))
  }

  test("PLAN: dedupSegments shuffles carry hashes and index arrays, never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val rows = (0L until 100L).map(i => (i, s"w$i x$i common tail words here"))
    val out = Lines.dedupSegments(docs(rows: _*), "id", "text",
      segSize = 3, minDocs = 2)
    out.collect() // AQE finalizes the plan (drop-list side becomes broadcast)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e.output.map(_.name)
    }
    val textCarrying = exchanges.filter(_.exists(_.contains("text")))
    assert(textCarrying.isEmpty,
      s"document text crossed a shuffle: $exchanges")
  }

  // ---------------------------------------------------- removeDuplicateSpans

  test("removeDuplicateSpans: unaligned copies die, interval union merges overlaps") {
    // doc 2 embeds doc 1's span [b c d] at offset 2 — unaligned vs doc 1's
    // offset 1; spanLen=3 windows overlap and the covered intervals merge
    val df = docs(
      (1L, "a b c d e f"),
      (2L, "x y b c d e z"),     // shares [b c d] and [c d e] with doc 1
      (3L, "p q r"))             // unrelated
    val out = Lines.removeDuplicateSpans(df, "id", "text", spanLen = 3, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // doc 1: condemned starts 1,2 cover tokens 1..4 -> keep "a f"
    // doc 2: condemned starts 2,3 cover tokens 2..5 -> keep "x y z"
    assert(out === Seq(
      (1L, 6, 4, "a f"),
      (2L, 7, 4, "x y z"),
      (3L, 3, 0, "p q r")))
  }

  test("removeDuplicateSpans: docs shorter than spanLen never condemn or change") {
    val df = docs((1L, "a b"), (2L, "a b"), (3L, "a b c d"))
    val out = Lines.removeDuplicateSpans(df, "id", "text", spanLen = 3, minDocs = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(out === Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d")))
  }

  test("PROPERTY: removeDuplicateSpans matches a naive reference on random corpora") {
    val rnd = new scala.util.Random(67)
    val vocab = Vector("a", "b", "c", "d")
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val L = 3
    def windows(t: String): Seq[(Int, String)] = {
      val tk = t.split(" ")
      if (tk.length < L) Seq.empty
      else (0 to tk.length - L).map(s => (s, tk.slice(s, s + L).mkString(" ")))
    }
    val docCount = rows.flatMap { case (i, t) => windows(t).map(_._2).distinct.map((_, i)) }
      .groupBy(_._1).map { case (g, xs) => (g, xs.map(_._2).distinct.size) }
    val condemned = docCount.filter(_._2 >= 2).keySet
    val expected = rows.map { case (i, t) =>
      val tk = t.split(" ")
      val covered = Array.fill(tk.length)(false)
      windows(t).foreach { case (s, g) =>
        if (condemned(g)) (s until math.min(s + L, tk.length)).foreach(covered(_) = true)
      }
      val kept = tk.indices.filterNot(covered).map(tk)
      (i, tk.length, covered.count(identity), kept.mkString(" "))
    }
    val got = Lines.removeDuplicateSpans(docs(rows: _*), "id", "text", L, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got === expected)
  }

  // ---------------------------------------------------------- noveltyStats

  test("noveltyStats counts per-doc distinct grams unique to the corpus") {
    val df = docs(
      (1L, "a b c d"),    // grams: "a b c", "b c d"
      (2L, "a b c x"),    // grams: "a b c", "b c x" — "a b c" shared
      (3L, "q r"))        // too short: 0 grams
    val out = Lines.noveltyStats(df, "id", "text", n = 3).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq((1L, 2, 1L), (2L, 2, 1L), (3L, 0, 0L)))
  }

  test("PROPERTY: noveltyStats matches a naive gram-count reference") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("u", "v", "w", "x")
    val rows = (0L until 30L).map { i =>
      val n = rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def gramsOf(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.size < 2) Set.empty
      else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    val counts = rows.flatMap { case (_, t) => gramsOf(t) }
      .groupBy(identity).map { case (g, xs) => (g, xs.size) }
    val expected = rows.map { case (i, t) =>
      val gs = gramsOf(t)
      (i, gs.size, gs.count(g => counts(g) == 1).toLong)
    }
    val got = Lines.noveltyStats(docs(rows: _*), "id", "text", n = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  // ----------------------------------------------------- fuzzyContaminated

  test("fuzzyContaminated flags by Jaccard threshold with best-eval argmax") {
    val s = spark
    import s.implicits._
    val evalSet = Seq(
      (100L, "a b c d e f"),          // grams(2): ab bc cd de ef (5)
      (101L, "a b c z z z")).toDF("eid", "text")
    val corpus = docs(
      (1L, "a b c d e f"),            // J=1.0 vs eval 100
      (2L, "a b c d x y"),            // vs100: inter 3, union 7 -> 3/7>=0.3
      (3L, "t u v w"))                // no overlap
    val out = Decontaminate.fuzzyContaminated(corpus, "id", "text",
        evalSet, "eid", "text", n = 2, jaccardNum = 3, jaccardDen = 10)
      .orderBy("contaminated_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 100L, 5L, 5L), (2L, 100L, 3L, 7L)))
  }

  test("fuzzyContaminated: exact integer threshold, no float epsilon") {
    val s = spark
    import s.implicits._
    val evalSet = Seq((9L, "a b c d e")).toDF("eid", "text") // 4 bigrams
    // inter 2 (ab, bc), union 4 + 4 - 2 = 6: J = 1/3 exactly
    val corpus = docs((1L, "a b c x y"))
    def run(num: Int, den: Int) =
      Decontaminate.fuzzyContaminated(corpus, "id", "text", evalSet, "eid", "text",
        n = 2, jaccardNum = num, jaccardDen = den).count()
    assert(run(1, 3) === 1L)   // 3*2 >= 1*6 — boundary included
    assert(run(34, 100) === 0L) // 100*2 < 34*6
  }

  test("fuzzyContaminated broadcasts the eval side (corpus text never shuffles)") {
    val s = spark
    import s.implicits._
    val evalSet = Seq((0L, "a b c")).toDF("eid", "text")
    val corpus = docs((1L, "a b c"), (2L, "x y z"))
    val plan = Decontaminate.fuzzyContaminated(corpus, "id", "text",
      evalSet, "eid", "text", n = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  // ----------------------------------------------------- canonicalByScore

  test("canonicalByScore keeps max score, ties to smallest id; singletons kept") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val members = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L)).toDF("id", "score")
    val out = Dedup.canonicalByScore(members, "id", "score", pairs)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ===
      Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false), (7L, 7L, true)))
  }

  test("canonicalByScore differs from min-id canonicalization when quality says so") {
    val s = spark
    import s.implicits._
    val pairs = Seq((10L, 20L)).toDF("id1", "id2")
    val members = Seq((10L, 1L), (20L, 2L)).toDF("id", "score")
    val byScore = Dedup.canonicalByScore(members, "id", "score", pairs)
      .where(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(byScore === Set(20L))
    val minId = Dedup.dropNearDuplicates(members, pairs, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(minId === Set(10L))
  }
}
