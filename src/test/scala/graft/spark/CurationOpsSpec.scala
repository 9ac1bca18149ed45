package graft.spark

import graft.pipeline.{Decontaminate, Dedup, Packing, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 curation operators: n-gram decontamination, sequence packing
  * (distributed prefix sum), repetition quality signals, SemDeDup. */
class CurationOpsSpec extends AnyFunSuite {

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

  // ------------------------------------------------------------ decontaminate

  test("decontaminate flags docs sharing an n-gram with the eval set") {
    val evalSet = docs((0L, "the quick brown fox jumps over the lazy dog"))
    val corpus = docs(
      (1L, "totally unrelated text about spark partitions and shuffles"),
      (2L, "he saw the quick brown fox jumps over it"), // shares a 5-gram run
      (3L, "quick brown fox sprints high"),             // shares only "quick brown fox"
      (4L, "nothing in common here at all"))
    val got3 = Decontaminate.contaminatedIds(corpus, "id", "text", evalSet, "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got3 === Set(2L, 3L))
    val got5 = Decontaminate.contaminatedIds(corpus, "id", "text", evalSet, "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(got5 === Set(2L)) // only doc 2 shares a full 5-gram
    val kept = Decontaminate.decontaminate(corpus, "id", "text", evalSet, "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
  }

  test("semantic decontamination flags cosine>=tau against any eval vector") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),    // exact eval copy
      (2L, Array(0.99f, 0.14f, 0.0f)),  // cos ~0.990 vs eval1 — below tau
      (3L, Array(0.0f, 1.0f, 0.0f)),    // matches eval2 exactly
      (4L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal to both
      (5L, Array(2.0f, 0.02f, 0.0f)),   // cos ~0.99995 vs eval1 — scale-invariant
      (6L, Array(0.0f, 0.0f, 0.0f)))    // zero-norm: scores 0, never flags
      .toDF("id", "emb")
    val evalSet = Seq(
      Tuple1(Array(1.0f, 0.0f, 0.0f)),
      Tuple1(Array(0.0f, 1.0f, 0.0f))).toDF("emb")
    val flagged = Decontaminate.semanticContaminatedIds(
        corpus, "id", "emb", evalSet, "emb", tau = 0.995)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 3L, 5L))
    val kept = Decontaminate.semanticDecontaminate(
        corpus, "id", "emb", evalSet, "emb", tau = 0.995)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 6L))
  }

  test("decontaminate minHits requires that many distinct shared n-grams") {
    val evalSet = docs((0L, "alpha beta gamma delta epsilon zeta"))
    val corpus = docs(
      (1L, "alpha beta gamma then unrelated then delta epsilon zeta"), // 2 disjoint 3-gram hits (+1 overlap)
      (2L, "alpha beta gamma only"))                                   // 1 hit
    val hits1 = Decontaminate.contaminatedIds(corpus, "id", "text", evalSet, "text",
      n = 3, minHits = 1).collect().map(_.getLong(0)).toSet
    assert(hits1 === Set(1L, 2L))
    val hits2 = Decontaminate.contaminatedIds(corpus, "id", "text", evalSet, "text",
      n = 3, minHits = 2).collect().map(_.getLong(0)).toSet
    assert(hits2 === Set(1L))
  }

  test("PROPERTY: decontamination matches a brute-force string-level reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def sentence(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val evalRows = (0 until 8).map(i => (i.toLong, sentence(12)))
    val corpusRows = (100 until 200).map(i => (i.toLong, sentence(15)))
    val n = 4
    val got = Decontaminate.contaminatedIds(
        corpusRows.toDF("id", "text"), "id", "text",
        evalRows.toDF("id", "text"), "text", n = n)
      .collect().map(_.getLong(0)).toSet
    def grams(t: String): Set[String] =
      t.split("\\s+").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val evalGrams = evalRows.flatMap(r => grams(r._2)).toSet
    val expect = corpusRows.filter(r => grams(r._2).exists(evalGrams)).map(_._1).toSet
    assert(got === expect)
    assert(expect.nonEmpty, "fixture should produce natural overlap") // 10-word vocab guarantees hits
  }

  test("contaminationReport counts distinct leaking corpus docs per eval item") {
    val evalSet = docs(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unique benchmark phrasing nothing shares this"))
    val corpus = docs(
      (1L, "he saw the quick brown fox jumps over it"),
      (2L, "again the quick brown fox jumps appears here"),
      (3L, "nothing in common with anything"))
    val got = Decontaminate.contaminationReport(corpus, "id", "text",
        evalSet, "id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(100L -> 2L, 101L -> 0L))
  }

  test("decontamination test is a broadcast join (corpus never shuffles)") {
    val evalSet = docs((0L, "a b c d e"))
    val corpus = docs((1L, "x y z a b c"), (2L, "p q r s t u"))
    val plan = Decontaminate.contaminatedIds(corpus, "id", "text", evalSet, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ----------------------------------------------------------------- packing

  test("withStartOffsets equals the sequential prefix sum, any partitioning") {
    val s = spark
    import s.implicits._
    val n = 1000
    val rows = (0 until n).map(i => (i.toLong, (i % 7 + 1).toLong))
    val df = rows.toDF("id", "nt").repartition(7) // scrambled input partitions
    for (parts <- Seq(1, 3, 8)) {
      val got = Packing.withStartOffsets(df, "id", "nt", numPartitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var acc = 0L
      rows.foreach { case (id, nt) =>
        assert(got(id) === acc, s"id=$id parts=$parts")
        acc += nt
      }
    }
  }

  test("packSequences: chunk = floor(start/budget); doc straddling the edge " +
       "belongs to the chunk containing its first token") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 6L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id", "nt")
    // starts: 0, 6, 9, 13; budget 5 -> seqs 0, 1, 1, 2
    val got = Packing.packSequences(df, "id", "nt", budget = 5L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("seq_id")).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val stats = Packing.sequenceStats(df, "id", "nt", budget = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats === Set((0L, 1L, 6L), (1L, 2L, 7L), (2L, 1L, 1L)))
  }

  test("packing handles empty input and null token counts") {
    val s = spark
    import s.implicits._
    assert(Packing.sequenceStats(Seq.empty[(Long, Long)].toDF("id", "nt"),
      "id", "nt", budget = 10L).count() === 0L)
    val withNull = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "nt")
    val got = Packing.withStartOffsets(withNull, "id", "nt")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 0L, 2L -> 5L, 3L -> 5L)) // null counts as 0
  }

  test("repeated prefix-sum calls reuse the session cache (one entry per plan, not per call)") {
    val s = spark
    import s.implicits._
    // the sorted range scan is SESSION-CACHED by design (persist dedupes by
    // logical plan): a second identical call must hit the cache — same
    // results either way, pinned here so the methodology stays deliberate
    val df = (0L until 200L).map(i => (i, i % 5 + 1)).toDF("id", "nt")
    val a = Packing.packSequences(df, "id", "nt", budget = 7L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"))).toMap
    val b = Packing.packSequences(df, "id", "nt", budget = 7L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"))).toMap
    assert(a === b)
    val c = graft.pipeline.Curriculum.difficultyBuckets(df, "id", "nt", 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val d = graft.pipeline.Curriculum.difficultyBuckets(df, "id", "nt", 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(c === d)
  }

  test("tokenBudgetSample carves exactly to the budget in stable hash order") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i % 9 + 1).toLong))
      .toDF("id", "nt").repartition(5)
    val kept = Packing.tokenBudgetSample(df, "id", "nt", budget = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: sequential walk in (md5(id), id) order
    val order = (0 until 500).map(_.toLong).sortBy { id =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id)
    }
    var acc = 0L
    val expect = order.takeWhile { id =>
      val keep = acc < 300L; acc += (id % 9 + 1); keep
    }.toSet
    // takeWhile over the running start: keep docs whose start < budget
    assert(kept.map(_._1).toSet === expect)
    // a larger budget's carve is a superset (prefix property)
    val kept2 = Packing.tokenBudgetSample(df, "id", "nt", budget = 600L)
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_._1).toSet.subsetOf(kept2))
  }

  // -------------------------------------------------------------- repetition

  test("topNgram finds the most frequent n-gram; ties go lexicographically") {
    val df = docs((1L, "spam spam spam eggs spam spam"))
    val r = df.select(TextAnalysis.topNgram(col("text"), 2)).collect()(0).getStruct(0)
    // 2-grams: [spam spam, spam spam, spam eggs, eggs spam, spam spam] -> "spam spam" x3
    assert(r.getLong(0) === 3L && r.getString(1) === "spam spam")
    // tie case: "a b" and "b a" both appear twice -> smallest gram wins
    val tie = docs((1L, "a b a b a"))
    val t = tie.select(TextAnalysis.topNgram(col("text"), 2)).collect()(0).getStruct(0)
    assert(t.getLong(0) === 2L && t.getString(1) === "a b")
  }

  test("repetition signals: duplicate segments and n-gram char mass") {
    val df = docs((1L, "Buy now. Buy now. Buy now. Limited offer."),
                  (2L, "One sentence. Another sentence. A third one."))
    val got = df.select(col("id"),
        TextAnalysis.duplicateSegmentFraction(col("text")).as("dup"),
        TextAnalysis.topNgramCharFraction(col("text"), 2).as("g2"),
        TextAnalysis.repetitionOk(col("text")).as("ok"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    // doc 1: 4 segments, "buy now" x3 duplicated -> dup frac 2/4
    assert(got(1L)._1 === 0.5)
    // "buy now." x3: gram "buy now." (8 chars incl '.') -- tokens are
    // whitespace-split so the dot stays attached; 3 * 8 / 41 chars
    assert(got(1L)._2 > 0.5 && !got(1L)._3)
    assert(got(2L)._1 === 0.0 && got(2L)._3)
  }

  test("rollingHash: order-sensitive, ANSI-safe on real documents") {
    val s = spark
    import s.implicits._
    // the old h*31 + hash formulation threw ARITHMETIC_OVERFLOW under ANSI
    // (Spark 4 default) on any document of >= 2 tokens
    val df = Seq("alpha beta gamma delta", "beta alpha gamma delta",
      "alpha beta gamma delta", "").toDF("text")
    val hs = df.select(graft.pipeline.TextAnalysis.rollingHash(col("text")))
      .collect().map(_.getLong(0))
    assert(hs(0) === hs(2), "same token order, same hash")
    assert(hs(0) !== hs(1), "different order, different hash")
  }

  test("topNgram on short/empty text returns zero counts") {
    val df = docs((1L, "single"), (2L, ""))
    val got = df.select(col("id"), TextAnalysis.topNgram(col("text"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).getLong(0)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("single-pass repetition expressions match the builtin formulations " +
       "on real corpus text") {
    val docs = graft.engine.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val both = docs
      .withColumn("st", TextAnalysis.repetitionStats(col("text")))
      .select(col("doc_id"),
        col("st.n_segs"),
        col("st.n_dup_segs"),
        col("st.top2_cnt"),
        col("st.top2_len"),
        col("st.top3_cnt"),
        col("st.top3_len"),
        size(TextAnalysis.segments(col("text"))).as("b_segs"),
        (size(TextAnalysis.segments(col("text"))) -
          size(array_distinct(TextAnalysis.segments(col("text"))))).as("b_dup"),
        TextAnalysis.topNgram(col("text"), 2).as("b2"),
        TextAnalysis.topNgram(col("text"), 3).as("b3"),
        TextAnalysis.repetitionOk(col("text")).as("ok_expr"),
        TextAnalysis.repetitionOkBuiltin(col("text")).as("ok_builtin"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === r.getInt(7), s"n_segs doc $id")
      assert(r.getInt(2) === r.getInt(8), s"n_dup_segs doc $id")
      val b2 = r.getStruct(9); val b3 = r.getStruct(10)
      assert(r.getLong(3) === b2.getLong(0), s"top2_cnt doc $id")
      assert(r.getInt(4) === b2.getString(1).codePointCount(0, b2.getString(1).length),
        s"top2_len doc $id")
      assert(r.getLong(5) === b3.getLong(0), s"top3_cnt doc $id")
      assert(r.getInt(6) === b3.getString(1).codePointCount(0, b3.getString(1).length),
        s"top3_len doc $id")
      assert(r.getBoolean(11) === r.getBoolean(12), s"repetitionOk doc $id")
    }
  }

  test("mojibake repair: restores misdecoded UTF-8, never corrupts clean text") {
    import graft.pipeline.textExpressions
    val clean = "café — naïve… 東京"
    // mojibake = the string's UTF-8 bytes misread as Latin-1 / cp1252
    def breakOnce(s: String): String =
      new String(s.getBytes("UTF-8").map(b => (b & 0xFF).toChar))
    def breakCp1252(s: String): String =
      new String(s.getBytes("UTF-8"), "windows-1252")
    // UTF-8 bytes 0x80-0x9F land on DEFINED cp1252 punctuation ('”' is
    // excluded: its 0x9D byte is undefined in cp1252, so that misdecode is
    // lossy — U+FFFD — and correctly unrepairable)
    val cp1252Clean = "em — dash “quote… €5"
    val cases = docs(
      (1L, breakOnce(clean)),                  // single Latin-1 misdecode
      (2L, breakOnce(breakOnce("café"))),      // double misdecode
      (3L, "plain ascii only"),                // no-op
      (4L, "real café, already correct"),      // latin1 accents: NOT valid UTF-8 bytes -> untouched
      (5L, "日本語テキスト"),                    // CJK: untouched
      (6L, breakCp1252(cp1252Clean)))          // windows-1252 misdecode (€/smart-quote range)
    val out = cases
      .select(col("id"), textExpressions.fixMojibake(col("text"), maxPasses = 2).as("f"),
        col("text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 === clean)
    assert(out(2L)._1 === "café")
    assert(out(3L)._1 === out(3L)._2)
    assert(out(4L)._1 === out(4L)._2)
    assert(out(5L)._1 === out(5L)._2)
    assert(out(6L)._1 === cp1252Clean, "cp1252 misdecode must repair")
    // maxPasses = 1 unwraps exactly one layer of a double misdecode
    val once = cases.where(col("id") === 2L)
      .select(textExpressions.fixMojibake(col("text"), maxPasses = 1))
      .head().getString(0)
    assert(once === breakOnce("café"))
  }

  test("blocklistStats: counts match a naive reference; case-insensitive; empty-text convention") {
    import graft.pipeline.textExpressions
    val words = Seq("Fox", "dog")
    val d = docs(
      (1L, "The quick brown FOX jumps over the lazy dog"),
      (2L, "no blocked words here"),
      (3L, ""))
    val out = d.select(col("id"),
        textExpressions.blocklistStats(col("text"), words).as("st"))
      .select(col("id"), col("st.n_blocked"), col("st.n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) === ((2, 9)))
    assert(out(2L) === ((0, 4)))
    // tokenize convention: empty text is one empty token (parity with
    // split(lower(trim(text)), "\\s+") and the text_tokens oracle)
    assert(out(3L) === ((0, 1)))
  }

  test("blocklistOk: single expression == stats + long threshold math, all permilles") {
    import graft.pipeline.textExpressions
    val words = Seq("Fox", "dog")
    val d = docs(
      (1L, "The quick brown FOX jumps over the lazy dog"), // 2/9 blocked
      (2L, "no blocked words here"),
      (3L, ""),                                            // empty: (0, 1)
      (4L, "dog dog dog"))                                 // 3/3 blocked
    for (permille <- Seq(0, 150, 222, 300, 1000)) {
      val got = d.select(col("id"),
          textExpressions.blocklistOk(col("text"), words, permille).as("ok"),
          textExpressions.blocklistStats(col("text"), words).as("st"))
        .select(col("id"), col("ok"),
          (col("st.n_blocked").cast("long") * 1000 <=
            col("st.n_tokens").cast("long") * permille).as("ref"))
        .collect()
      got.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2),
        s"permille=$permille id=${r.getLong(0)}"))
    }
  }

  test("markerCount: hash-probe membership matches a brute-force count") {
    val d = docs(
      (1L, "the cat and the dog in the house"),
      (2L, "ZXQV wkjh"),
      (3L, ""))
    val markers = Seq("the", "and", "in")
    val got = d.select(col("id"),
        TextAnalysis.markerCount(col("text"), markers).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 5, 2L -> 0, 3L -> 0))
  }

  test("knnGraph: planted copies are each other's top-1; k rows max per id") {
    import graft.pipeline.Similarity
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val base = (0 until 120).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val copies = (0 until 10).map(i => (500L + i, base(i)._2)) // exact duplicates
    val df = (base ++ copies).toDF("vec_id", "embedding").repartition(4)
    val g = Similarity.knnGraph(df, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // each id contributes at most k edges, ranks are 1..k in order
    g.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length <= 3, s"id $id has ${rows.length} edges")
      assert(rows.map(_._2).sorted === (1 to rows.length).toSeq, s"ranks of $id")
    }
    // an exact copy shares every LSH bucket: top-1 must be the twin (cos=1)
    val top1 = g.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    (0 until 10).foreach { i =>
      assert(top1(500L + i) === i.toLong, s"copy ${500 + i} top-1")
      assert(top1(i.toLong) === 500L + i, s"original $i top-1")
    }
    // plan contract for the Q = N regime: the rank is a plain window with
    // Spark's partial top-k pushed below its shuffle (spillable, codegen),
    // and no extra explicit repartition rides in front of it
    val plan = Similarity.knnGraph(df, "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit (partial top-k pushdown) in plan:\n$plan")
    assert(!plan.contains("REPARTITION_BY_COL"),
      s"unexpected explicit repartition in knnGraph plan:\n$plan")
  }

  test("kmeans: farthest-point seeding recovers planted orthogonal groups; partitioning-invariant") {
    import graft.pipeline.Similarity
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // 3 near-orthogonal groups: dominant one-hot dim + small noise
    val rows = (0 until 300).map { i =>
      val g = i % 3
      val v = Seq.tabulate(8)(d =>
        (if (d == g) 100.0 else 0.0) + rnd.nextDouble() * 0.01)
      (i.toLong, v)
    }
    def run(parts: Int) = {
      val df = rows.toDF("vec_id", "vec").repartition(parts)
      Similarity.kmeans(df, "vec_id", "vec", k = 3, iters = 2)
    }
    val (c1, a1) = run(4)
    val groups = a1.select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // exact recovery: cluster assignment is constant within each planted
    // group and distinct across groups
    val byGroup = groups.groupBy(_._1 % 3).map { case (g, xs) => g -> xs.map(_._2).toSet }
    assert(byGroup.values.forall(_.size == 1), s"split group: $byGroup")
    assert(byGroup.values.flatten.toSet.size === 3, s"merged groups: $byGroup")
    // decimal Lloyd means: centroids identical under a different partitioning
    val (c2, _) = run(13)
    assert(c1 === c2, "centroids not partitioning-invariant")
  }

  test("ivfBuild auto-sizes cells to ~sqrt(N) when nCells <= 0") {
    import graft.pipeline.Similarity
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val emb = (0 until 400).map(i => (i.toLong, Seq.fill(4)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val (centroids, index) = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCells = 0, iters = 1)
    assert(centroids.size === 20) // ceil(sqrt(400))
    assert(index.select("cell").distinct().count() <= 20)
    // floor: tiny corpora still get the minimum cell count's worth
    val tiny = (0 until 10).map(i => (i.toLong, Seq.fill(4)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val (c2, _) = Similarity.ivfBuild(tiny, "vec_id", "embedding", nCells = 0, iters = 1)
    assert(c2.size === 10) // capped by corpus size below the floor of 16
  }

  // ---------------------------------------------------------------- sampling

  test("weightedSample keeps ~weight fraction, is rerun-stable, honors extremes") {
    import graft.pipeline.Sampling
    val s = spark
    import s.implicits._
    val df = (0 until 4000).map(i => (i.toLong, i % 4)).toDF("id", "grp")
    // weight by group: 0 -> never, 1 -> always, 2 -> 0.25, 3 -> 0.75
    val w = when(col("grp") === 0, 0.0).when(col("grp") === 1, 1.0)
      .when(col("grp") === 2, 0.25).otherwise(0.75)
    val kept = Sampling.weightedSample(df, "id", w)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0))                      // weight 0: never kept
    assert(kept(1) === 1000L)                      // weight 1: all kept
    assert(math.abs(kept(2) - 250L) < 80, s"got $kept")  // ~25% of 1000
    assert(math.abs(kept(3) - 750L) < 80, s"got $kept")  // ~75% of 1000
    // rerun-stable: the same call yields the identical id set
    val ids1 = Sampling.weightedSample(df, "id", w).select("id")
      .collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.weightedSample(df.repartition(7), "id", w).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  // -------------------------------------------------------------------- skew

  test("saltedAgg and saltedJoin equal their unsalted counterparts on skewed data") {
    import graft.engine.Skew
    val s = spark
    import s.implicits._
    // 90% of rows land on one hot key
    val rows = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (i.toLong, k, (i % 13).toLong)
    }
    val df = rows.toDF("id", "k", "v").repartition(6)
    val salted = Skew.saltedAgg(df, Seq("k"), Seq("id"), salt = 8,
        aggs = Seq("sum_v" -> ("v", "sum"), "n" -> ("v", "count"),
          "min_v" -> ("v", "min"), "max_v" -> ("v", "max")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val plain = df.groupBy("k")
      .agg(sum("v"), count(lit(1)), min("v"), max("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted === plain)

    val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B")).toDF("k", "label")
    val joined = Skew.saltedJoin(df, dim, "k", Seq("id"), salt = 4)
      .groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val plainJoin = df.join(dim, "k")
      .groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(joined === plainJoin)
  }

  // ------------------------------------------------------------- full runner

  test("Curation.run: mojibake repair rewrites before the gates, blocklist gate drops and attributes") {
    import graft.pipeline.Curation
    def breakOnce(s: String): String =
      new String(s.getBytes("UTF-8").map(b => (b & 0xFF).toChar))
    val d = docs(
      (1L, breakOnce("the café fox jumps over the lazy dog")), // repairable mojibake
      (2L, "the bad bad bad bad words everywhere bad bad bad"), // 7/9 blocked
      (3L, "the clean document with plenty of ordinary words"))
    val res = Curation.run(d, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false, fixMojibake = true,
        blocklist = Some(Curation.BlocklistConfig(Seq("bad"), maxPermille = 300))),
      trackDrops = true)
    val kept = res.docs.select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet === Set(1L, 3L))
    assert(kept(1L) === "the café fox jumps over the lazy dog",
      "mojibake must repair before any gate fingerprints the text")
    assert(res.stageCounts.map(_._1).contains("fix_mojibake"))
    val drops = res.drops.get.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(drops === Set((2L, "gates")))
  }

  test("Curation.run composes the stages and reports the funnel") {
    import graft.pipeline.Curation
    val good = "a perfectly ordinary sentence with plenty of everyday english words in it"
    val v = docs(
      (1L, good),
      (2L, good),                              // exact dup of 1
      (3L, ("buy now. " * 15).trim),           // repetition gate
      (4L, "tiny"),                            // quality gate
      (5L, s"$good with a twist at the end"),
      (6L, s"$good mail bob@x.io"))            // pii (scrubbed, not dropped)
    val evalSet = docs((0L, s"$good with a twist at the end"))  // contaminates 5
    val res = Curation.run(
      v.withColumn("text", concat(lit("<p>"), col("text"), lit("</p><script>junk()</script>"))),
      "id", "text",
      Curation.Config(extractHtml = true, scrubPii = true, packBudget = Some(8L),
        shards = Some(Curation.ShardConfig(nShards = 2, seed = 7))),
      evalSet = Some(evalSet.select(col("text"))))
    val kept = res.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 6L))
    // doc 6 survived with its email scrubbed
    val t6 = res.docs.where(col("id") === 6L).select("text").collect()(0).getString(0)
    assert(t6.contains("<EMAIL>") && !t6.contains("@"))
    // every surviving doc carries a sequence assignment AND, with the
    // shard stage on, a reproducible shard/read-position keyed on seq_id
    assert(res.docs.columns.contains("seq_id"))
    assert(res.docs.columns.contains("shard") && res.docs.columns.contains("pos"))
    val shardBySeq = res.docs.select("seq_id", "shard").distinct().collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res.docs.select("seq_id", "shard").collect()
      .forall(r => shardBySeq(r.getLong(0)) === r.getInt(1)), "a sequence straddled shards")
    val funnel = res.stageCounts.toMap
    assert(funnel("input") === 6L)
    assert(funnel("exact_dedup") === 5L)   // dup of 1 dropped
    assert(funnel("gates") === 3L)         // 3 and 4 gated
    assert(funnel("decontaminated") === 2L) // 5 contaminated by eval set
  }

  test("Curation.run: C4 stage rewrites lines and drops gated pages") {
    import graft.pipeline.{C4Rules => _, Curation}
    val goodLine = "a perfectly ordinary sentence with plenty of everyday words."
    val v = docs(
      (1L, Seq(goodLine, goodLine, goodLine).mkString("\n")),            // survives intact
      (2L, Seq(goodLine, goodLine, goodLine, "no punct here at all",
        "Please enable JavaScript now, reader.").mkString("\n")),        // 2 lines stripped
      (3L, Seq(goodLine, goodLine).mkString("\n")),                      // < minLines
      (4L, Seq(goodLine, goodLine, goodLine, "body { color: red }").mkString("\n")))
    val res = Curation.run(v, "id", "text",
      Curation.Config(c4Rules = Some(Curation.C4Config()),
        exactDedup = false, requireQuality = false, requireRepetitionOk = false))
    val byId = res.docs.select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 3 fails min kept lines; 4 has a curly brace (page gate)
    assert(byId.keySet === Set(1L, 2L))
    assert(byId(1L) === Seq(goodLine, goodLine, goodLine).mkString("\n"))
    assert(byId(2L) === Seq(goodLine, goodLine, goodLine).mkString("\n"))
    assert(res.stageCounts.toMap.apply("c4_rules") === 2L)
  }

  test("Curation.run: quantile-derived length gate, bloom decon, source mixing") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val words = Vector("plain", "everyday", "words", "about", "ordinary", "things",
      "written", "here", "for", "testing", "purposes", "only")
    def text(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    // length distribution: half short (5 tokens), half long (40 tokens)
    val v = (0L until 100L).map { i =>
      (i, if (i % 2 == 0) text(5) else text(40), if (i < 50) "web" else "code")
    }.toDF("id", "text", "source")
    // permille 600 lands on the long mode -> the 5-token half gates out
    val res = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, requireRepetitionOk = false,
        minTokensPermille = Some(600),
        sourceMix = Some(Curation.MixConfig("source",
          Map("web" -> 1.0, "code" -> 1.0), budgetTokens = 1000000L))))
    val kept = res.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.forall(_ % 2 == 1), "only 40-token docs survive p600 gate")
    // ample budget + both sources shared -> mixing drops nothing here
    assert(res.stageCounts.toMap.apply("source_mix") === kept.size.toLong)
    // unshared source drops wholesale
    val res2 = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, requireRepetitionOk = false,
        sourceMix = Some(Curation.MixConfig("source", Map("web" -> 1.0), 1000000L))),
      trackFunnel = false)
    assert(res2.docs.select("source").distinct().collect().map(_.getString(0)).toSeq === Seq("web"))
    // per-source cap stage bounds each source
    val res3 = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false,
        sourceCap = Some(Curation.CapConfig("source", maxDocs = 10))),
      trackFunnel = false)
    val capped = res3.docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped.values.forall(_ === 10L) && capped.keySet === Set("web", "code"))
    assert(!res3.docs.columns.contains("rank"))
    // bloom decontamination path == exact path
    val evalSet = v.where($"id" === 1L).select("text")
    val exact = Curation.run(v, "id", "text", Curation.Config(exactDedup = false,
        requireQuality = false, requireRepetitionOk = false, decontaminationN = 5),
      evalSet = Some(evalSet), trackFunnel = false)
      .docs.select("id").collect().map(_.getLong(0)).toSet
    val bloomed = Curation.run(v, "id", "text", Curation.Config(exactDedup = false,
        requireQuality = false, requireRepetitionOk = false, decontaminationN = 5,
        bloomDecontamination = true),
      evalSet = Some(evalSet), trackFunnel = false)
      .docs.select("id").collect().map(_.getLong(0)).toSet
    assert(bloomed === exact)
    assert(!bloomed.contains(1L))
  }

  test("Curation.run: URL dedup + domain cap + DSIR selection stages") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    // 40 pages: ids 0-19 target-like text, 20-39 off-domain; every even id
    // is a URL-duplicate of the preceding odd id (same normalized URL)
    def pageText(i: Long): String =
      if (i < 20) "alpha beta gamma alpha beta gamma delta"
      else "zeta eta theta zeta eta theta iota"
    val v = (0L until 40L).map { i =>
      val page = i / 2   // pairs share a page
      val dom = if (i % 4 < 2) "big.com" else "small.org"
      val url = if (i % 2 == 0) s"HTTPS://WWW.$dom/p/$page?utm_source=x"
                else s"https://$dom/p/$page"
      (i, pageText(i) + s" unique$i", url)  // text differs, URL collides
    }.toDF("id", "text", "url")
    val res = Curation.run(v, "id", "text",
      Curation.Config(urls = Some(Curation.UrlConfig("url", dedup = true,
          domainCap = Some(5))),
        exactDedup = false, requireQuality = false, requireRepetitionOk = false),
      trackFunnel = true)
    val funnel = res.stageCounts.toMap
    assert(funnel("url_dedup") === 20L)   // each pair collapses to its even id
    assert(funnel("domain_cap") === 10L)  // 2 domains x cap 5
    val ids = res.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 2 == 0), "first fetch (smaller id) survives URL dedup")
    assert(!res.docs.columns.contains("domain") && !res.docs.columns.contains("rank"))
    // DSIR stage: target-like docs only, k bounds the pool
    val tgt = Seq((100L, "alpha beta gamma")).toDF("id", "text")
    val sel = Curation.run(v, "id", "text",
      Curation.Config(dsirK = Some(8), dsirBuckets = 256, exactDedup = false,
        requireQuality = false, requireRepetitionOk = false),
      trackFunnel = false, dsirTarget = Some(tgt))
    val selIds = sel.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(selIds.size === 8 && selIds.forall(_ < 20L))
    // trained-model gate: classifier trained target-vs-offdomain keeps only
    // target-like docs
    val model = graft.pipeline.QualityClassifier.train(
      v.where($"id" < 20).select($"text"), v.where($"id" >= 20).select($"text"),
      "text", buckets = 1 << 10, iters = 30)
    val gated = Curation.run(v, "id", "text",
      Curation.Config(qualityModel = Some(model), exactDedup = false,
        requireQuality = false, requireRepetitionOk = false),
      trackFunnel = false)
    val gatedIds = gated.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(gatedIds === (0L until 20L).toSet)
  }

  test("Curation.run: seg dedup, keep-best near-dedup, fuzzy decon, curriculum") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    // docs 1/2 share the window "dup seg here" (cross-doc, condemned);
    // docs 3/4 are near-identical with 4 scoring higher; doc 5 leaks an
    // eval item fuzzily (no full doc copy)
    val v = Seq(
      (1L, "dup seg here unique one text body flows", 10L),
      (2L, "dup seg here other two text body drifts", 10L),
      (3L, "threeway match candidate text body keeps going longer now", 1L),
      (4L, "threeway match candidate text body keeps going longer now!", 9L),
      (5L, "quick brown fox jumps over the lazy dog today", 10L),
      (6L, "completely unrelated filler content stands alone fine", 10L))
      .toDF("id", "text", "score")
    val evalSet = Seq(("quick brown fox jumps over the lazy dog", 0))
      .toDF("text", "ignore").select($"text")

    // seg dedup stage: the shared 3-token window dies in docs 1 and 2
    val seg = Curation.run(v, "id", "text",
      Curation.Config(segDedup = Some(Curation.SegDedupConfig(segSize = 3)),
        exactDedup = false, requireQuality = false, requireRepetitionOk = false),
      trackFunnel = true)
    val segText = seg.docs.select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!segText(1L).contains("dup seg here") && !segText(2L).contains("dup seg here"))
    assert(segText(6L) === "completely unrelated filler content stands alone fine")
    assert(seg.docs.columns.toSet === Set("id", "text", "score"))

    // keep-best near-dedup: cluster {3,4} keeps 4 (higher score), not min id
    val kb = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, nearDupThreshold = Some(0.5),
        nearDupKeepBest = Some("score"),
        requireQuality = false, requireRepetitionOk = false),
      trackFunnel = false)
    val kbIds = kb.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(kbIds.contains(4L) && !kbIds.contains(3L))
    assert(Set(1L, 2L, 5L, 6L).subsetOf(kbIds), "non-clustered docs survive")

    // fuzzy decon: doc 5 shares most 2-grams with the eval item -> dropped;
    // exact-rule config would also catch it, so assert the fuzzy threshold
    // spares a doc with only ONE shared gram
    val fz = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, decontaminationN = 2,
        fuzzyDeconThreshold = Some((1, 2)),
        requireQuality = false, requireRepetitionOk = false),
      evalSet = Some(evalSet), trackFunnel = false)
    val fzIds = fz.docs.select("id").collect().map(_.getLong(0)).toSet
    assert(!fzIds.contains(5L) && Set(1L, 2L, 3L, 4L, 6L).subsetOf(fzIds))

    // curriculum annotation: buckets follow the score order, column rides out
    val cu = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false,
        curriculum = Some(Curation.CurriculumConfig("score", nBuckets = 3))),
      trackFunnel = false)
    val buckets = cu.docs.select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(3L) === 0, "lowest score lands in bucket 0")
    assert(buckets.values.max === 2)
  }

  test("unicodeNormalize: NFC folds combining accents; strip removes invisibles") {
    import graft.pipeline.textExpressions
    val s = spark
    import s.implicits._
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val dirty = "a b\u200bc\ufeffd\te"
    val df = Seq((1L, decomposed), (2L, composed), (3L, dirty)).toDF("id", "t")
    val out = df.select(col("id"),
        textExpressions.unicodeNormalize(col("t"), "NFC").as("nfc"),
        textExpressions.unicodeNormalize(col("t"), "NFC", stripInvisible = true).as("clean"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === composed, "decomposed folds to precomposed")
    assert(out(1).getString(1) === composed)
    assert(out(2).getString(2) === "a bcd\te", "controls and zero-widths stripped, tab kept")
    // codegen parity: the filter below runs through whole-stage codegen
    val n = df.where(textExpressions.unicodeNormalize(col("t"), "NFC") === composed).count()
    assert(n === 2L)
    // SQL surface
    graft.engine.GraftFunctions.register(s)
    val viaSql = s.sql(s"SELECT emo_nfc('cafe\u0301') AS x, " +
      "length(emo_nfc('cafe\u0301')) AS l").head()
    assert(viaSql.getString(0) === composed && viaSql.getInt(1) === 4)
    // NFKC also folds compatibility forms (ligature fi)
    val k = df.sparkSession.sql("SELECT emo_nfc('\ufb01sh', 'NFKC') AS x").head().getString(0)
    assert(k === "fish")
  }

  test("templateGroups: digit-normalized duplicates group; distinct texts counted") {
    val df = docs(
      (1L, "error 404 at line 17"),
      (2L, "error 500 at line 3"),     // same template as 1
      (3L, "error 404 at line 17"),    // exact dup of 1
      (4L, "all good no numbers"))
    val got = Dedup.templateGroups(df, "text", "id")
      .orderBy("canonical_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, 3L, 2L), (4L, 1L, 1L)))
  }

  test("fuzzy decon stage: duplicate eval items don't double-count intersections") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    // doc 1 vs the eval item: bigrams inter=2 (a b, b c), union 4+4-2=6,
    // true Jaccard 1/3 < 1/2 -> must NOT be flagged. With the eval item
    // duplicated, a colliding synthetic id would inflate inter to 4 and
    // falsely flag (4*2 >= 8*1).
    val corpus = Seq((1L, "a b c x y")).toDF("id", "text")
    val evalSet = Seq(("a b c d e", 1), ("a b c d e", 2)).toDF("text", "n")
      .select($"text")
    val out = Curation.run(corpus, "id", "text",
      Curation.Config(exactDedup = false, decontaminationN = 2,
        fuzzyDeconThreshold = Some((1, 2)),
        requireQuality = false, requireRepetitionOk = false),
      evalSet = Some(evalSet), trackFunnel = false)
    assert(out.docs.count() === 1L, "sub-threshold doc survives duplicate eval rows")
  }

  test("JSONL ingest: clean rows round-trip, malformed lines quarantine") {
    import graft.pipeline.Sources
    import org.apache.spark.sql.types._
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("jsonl_test")
    java.nio.file.Files.writeString(dir.resolve("part-0.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |not json at all
        |{"doc_id": 2, "text": "beta é"}
        |{"doc_id": 3 BROKEN
        |""".stripMargin)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val clean = Sources.readJsonlClean(s, dir.toString, schema)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(clean.toSeq === Seq((1L, "alpha"), (2L, "beta é")))
    val bad = Sources.corruptLines(s, dir.toString, schema)
      .collect().map(_.getString(0)).toSet
    assert(bad === Set("not json at all", "{\"doc_id\": 3 BROKEN"))
    // gzip write round-trip preserves rows exactly
    val out = dir.resolve("out").toString
    Sources.writeJsonl(Sources.readJsonlClean(s, dir.toString, schema), out, shards = 2)
    val back = Sources.readJsonlClean(s, out, schema)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === clean.toSeq)
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".json.gz")))
  }

  // ------------------------------------------------------------------ report

  test("CurationReport tags each failed gate; reasonCounts attributes the corpus") {
    import graft.pipeline.CurationReport
    val clean = "a perfectly ordinary sentence with plenty of everyday words in it today"
    val v = docs(
      (1L, clean),
      (2L, ("buy now. " * 15).trim),                       // repetition (and short segs dup)
      (3L, "tiny"),                                        // quality (too few tokens)
      (4L, s"$clean mail bob@x.io"),                       // pii
      (5L, "x " * 3 + "y"))                                // quality + repetition ("x x" x2 = 6/7 chars)
    val got = CurationReport.annotate(v, "text")
      .select(col("id"), concat_ws(",", col("reject_reasons")).as("r"), col("accepted"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) === ("", true))
    assert(got(2L)._1.contains("repetition") && !got(2L)._2)
    assert(got(3L) === ("quality", false))
    assert(got(4L) === ("pii", false))
    assert(got(5L) === ("quality,repetition", false))
    val counts = CurationReport.reasonCounts(v, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("accepted") === 1L)
    assert(counts("quality") === 2L)
    assert(counts("pii") === 1L)
    assert(counts("repetition") === 2L)
  }

  // ------------------------------------------------------------------- spans

  test("duplicatedSpanStats marks spans shared across docs, not within one doc") {
    val boiler = "all rights reserved contact the site administrator for details"
    val v = docs(
      (1L, s"unique article text here okay fine. $boiler"),
      (2L, s"different story entirely my friend now. $boiler"),
      (3L, "solo content never repeated anywhere at all by anyone ever"),
      // doc 4 repeats ITS OWN phrase twice: spans are distinct per doc, so
      // self-repetition alone must not count as duplication
      (4L, "echo echo echo echo echo echo echo echo echo echo"))
    val got = Dedup.duplicatedSpanStats(v, "id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1/2 share the 5-gram spans inside the boilerplate tail
    assert(got(1L)._2 > 0, s"doc1 shares boilerplate spans: $got")
    assert(got(2L)._2 > 0)
    assert(got(3L)._2 === 0)
    // doc 4: one distinct span ("echo"x5) seen only in doc 4 -> no dup
    assert(got(4L) === (1L, 0L))
  }

  // ---------------------------------------------------------------- lm score

  test("dedupedSegments keeps the first occurrence of each distinct segment") {
    import graft.pipeline.TextClean
    val v = docs((1L, "alpha one. beta two! alpha one. gamma three? beta two"))
    val got = v.select(TextClean.dedupedSegments(col("text")).as("segs"))
      .collect()(0).getSeq[String](0)
    assert(got === Seq("alpha one", "beta two", "gamma three"))
  }

  test("stripBoilerplate removes cross-doc frequent segments, keeps unique ones") {
    import graft.pipeline.TextClean
    val unique = (1L to 10L).map(i => s"document body number $i with its own words")
    val v = docs((1L to 10L).map { i =>
      (i, s"${unique(i.toInt - 1)}. all rights reserved" +
        (if (i <= 3) ". subscribe to our newsletter" else ""))
    }: _*)
    val got = TextClean.stripBoilerplate(v, "id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    (1L to 10L).foreach { i =>
      val (nSegs, nStripped, clean) = got(i)
      val expected = unique(i.toInt - 1) +
        (if (i <= 3) ". subscribe to our newsletter" else "") // 3 docs < minDocs: stays
      assert(clean === expected, s"doc $i")                   // "all rights reserved" gone
      assert(nStripped === 1, s"doc $i")
      assert(nSegs === (if (i <= 3) 3 else 2))
    }
    // minDocs=1: every segment qualifies, everything is stripped
    val all = TextClean.stripBoilerplate(v, "id", "text", minDocs = 1)
      .collect().map(r => (r.getInt(2), r.getString(3)))
    assert(all.forall { case (stripped, clean) => stripped > 0 && clean === "" })
    // the boilerplate discovery is capped deterministically
    val capped = TextClean.stripBoilerplate(v, "id", "text", minDocs = 1, maxBoilerplate = 1)
      .collect().map(_.getInt(2))
    assert(capped.forall(_ === 1)) // only the most frequent segment strips
  }

  test("PROPERTY: stripBoilerplate matches a naive reference on random corpora") {
    import graft.pipeline.TextClean
    val rnd = new scala.util.Random(41)
    val pool = Vector("alpha beta", "gamma delta", "epsilon zeta", "eta theta",
      "iota kappa", "lambda mu", "nu xi", "omicron pi")
    for (trial <- 0 until 3) {
      val rows = (0L until 80L).map { i =>
        val nSegs = rnd.nextInt(4) + 1
        (i, Seq.fill(nSegs)(pool(rnd.nextInt(pool.size))).mkString(". "))
      }
      val minDocs = 20L
      // naive: doc frequency per distinct trimmed segment
      val dfreq = rows.flatMap { case (_, t) =>
        t.split("[.!?]").map(_.trim).filter(_.nonEmpty).distinct
      }.groupBy(identity).map { case (s, g) => s -> g.size }
      val boiler = dfreq.filter(_._2 >= minDocs).keySet
      val expected = rows.map { case (id, t) =>
        val segs = t.split("[.!?]").map(_.trim).filter(_.nonEmpty).toSeq
        val kept = segs.filterNot(boiler)
        id -> ((segs.size, segs.size - kept.size, kept.mkString(". ")))
      }.toMap
      val got = TextClean.stripBoilerplate(docs(rows: _*), "id", "text", minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("Curation.run boilerplate stage: shared tails stripped, then dedup bites") {
    import graft.pipeline.Curation
    val body = "a perfectly ordinary sentence with plenty of everyday english words in it"
    val other = "an entirely different document body with its own distinctive words here"
    val v = docs(
      (1L, s"$body. all rights reserved"),
      (2L, s"$body. all rights reserved"),   // same body, same tail
      (3L, s"$body"),                        // same body, no tail
      (4L, s"$other. all rights reserved"),
      (5L, s"$other. all rights reserved"))
    val res = Curation.run(v, "id", "text",
      Curation.Config(boilerplateMinDocs = Some(4L), requireRepetitionOk = false))
    // tail stripped everywhere -> docs 1,2,3 identical -> exact dedup keeps one
    val kept = res.docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet === Set(1L, 4L))
    assert(kept(1L) === body && kept(4L) === other)
    val funnel = res.stageCounts.toMap
    assert(funnel("boilerplate") === 5L)
    assert(funnel("exact_dedup") === 2L)
  }

  test("LmScore bigrams: counts match a brute-force walk; word salad is OOV-heavy") {
    import graft.pipeline.LmScore
    val rows = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the cat sat on the rug while the cat sat still"),
      (3L, "sat cat the on mat the"), // same unigrams, scrambled bigrams
      (4L, "x"))                      // single token: zero bigrams
    val corpus = docs(rows: _*)
    val bigrams = LmScore.bigramVocabulary(corpus, "text", topV = 6)
      .collect().map(_.getString(0)).toSeq
    assert(bigrams.contains("the cat") && bigrams.contains("cat sat"))
    val counts = LmScore.bigramCounts(corpus, "id", "text", bigrams)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val bs = bigrams.toSet
    rows.foreach { case (id, text) =>
      val toks = text.split("\\s+")
      val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(counts(id) === ((grams.count(bs), grams.count(g => !bs(g)))), s"doc $id")
    }
    assert(counts(4L) === ((0, 0)))
    // the scrambled doc covers fewer top bigrams than the natural ones
    assert(counts(3L)._1 < counts(1L)._1)
    // single-pass expression == builtin formulation
    val builtin = LmScore.bigramCountsBuiltin(corpus, "id", "text", bigrams)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(builtin === counts)
    // single-pass WordNgramsExpr == builtin wordNgrams, per doc and n
    for (n <- 1 to 3) {
      corpus.select(
          graft.pipeline.textExpressions.wordNgrams(col("text"), n).as("fast"),
          TextAnalysis.wordNgrams(col("text"), n).as("slow"))
        .collect().foreach { r =>
          assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
        }
    }
  }

  test("LmScore: vocab counts match a brute-force walk; likelihood ranks " +
       "ordinary text above OOV gibberish") {
    import graft.pipeline.LmScore
    val corpus = docs(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat and the dog"),
      (4L, "zxqv wkjh qpzm xkcd"))
    val vocabDf = LmScore.vocabulary(corpus, "text", topV = 5).collect()
    val vocab = vocabDf.map(_.getString(0)).toSeq
    assert(vocab.head === "the") // most frequent token first
    assert(vocab.size === 5)
    val counts = LmScore.vocabCounts(corpus, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // brute force per doc
    val vs = vocab.toSet
    Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
        (3L, "the cat and the dog"), (4L, "zxqv wkjh qpzm xkcd")).foreach {
      case (id, text) =>
        val toks = text.split("\\s+")
        assert(counts(id) === (toks.count(vs), toks.count(t => !vs(t))), s"doc $id")
    }
    // single-pass hash-probe expression == builtin literal-array formulation
    val builtin = LmScore.vocabCountsBuiltin(corpus, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(builtin === counts)
    // likelihood: build the full unigram model and compare doc 1 vs doc 4
    val all = corpus.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = all.values.sum
    val ll = corpus.select(col("id"),
        LmScore.unigramLogLikelihood(col("text"), all, total).as("ll"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ll(1L) > ll(4L), s"ordinary text should outscore gibberish: $ll")
  }

  test("LmScore: mixed-case vocab entries match (probe set and builtin " +
       "both lowercase-fold to meet the lowercased token stream)") {
    import graft.pipeline.LmScore
    val corpus = docs((1L, "The Cat sat"), (2L, "dog RAN far"))
    // user-supplied vocab with arbitrary casing: tokenization lowercases
    // the text side, so the probe set must fold the vocab the same way —
    // before the fix these entries silently never matched
    val vocab = Seq("THE", "Cat", "ran")
    val expr = LmScore.vocabCounts(corpus, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(expr(1L) === ((2, 1)))  // the, cat in-vocab; sat OOV
    assert(expr(2L) === ((1, 2)))  // ran in-vocab; dog, far OOV
    val builtin = LmScore.vocabCountsBuiltin(corpus, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(builtin === expr)
    // bigram path: same fold
    val bg = LmScore.bigramCounts(corpus, "id", "text", Seq("The Cat", "DOG ran"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(bg(1L) === ((1, 1)))  // "the cat" in-vocab; "cat sat" OOV
    assert(bg(2L) === ((1, 1)))
    val bgBuiltin = LmScore.bigramCountsBuiltin(corpus, "id", "text",
        Seq("The Cat", "DOG ran"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(bgBuiltin === bg)
    // gram entries with irregular internal whitespace normalize to the
    // single-space probe-key shape (tokens joined by ONE space)
    val ws = LmScore.bigramCounts(corpus, "id", "text", Seq("the\tcat", "dog  ran"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ws(1L) === 1 && ws(2L) === 1)
  }

  test("LmScore: vocab fold is locale-independent (Turkish dotless-i " +
       "must not corrupt ASCII entries under a tr default locale)") {
    import graft.pipeline.LmScore
    val prior = java.util.Locale.getDefault
    try {
      // under tr, String.toLowerCase("III") is "ııı" (dotless) — a probe
      // set folded that way would silently never match the UTF8String-
      // lowercased token stream; the fold must go through the same
      // UTF8String path the tokenizer uses
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val corpus = docs((1L, "Title III provisions"))
      val counts = LmScore.vocabCounts(corpus, "id", "text", Seq("III"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(counts(1L) === 1, "ASCII vocab entry must match under tr locale")
    } finally java.util.Locale.setDefault(prior)
  }

  // --------------------------------------------------------------- textclean

  test("TextClean scrubs emails/URLs/phones with typed placeholders, in order") {
    import graft.pipeline.TextClean
    val df = docs(
      (1L, "mail a@b.co or b@c.org today"),
      (2L, "see https://x.io/p?q=1 and http://y.z/2"),
      (3L, "call +44 20 7946 0958 now"),
      (4L, "digits inside https://a.b/12345678901 stay a URL"),
      (5L, "clean"))
    val got = df.select(col("id"), TextClean.scrub(col("text")).as("t"),
        TextClean.emailCount(col("text")).as("e"),
        TextClean.urlCount(col("text")).as("u"),
        TextClean.phoneCount(col("text")).as("p"),
        TextClean.piiFree(col("text")).as("free"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap
    assert(got(1L) === ("mail <EMAIL> or <EMAIL> today", 2, 0, 0, false))
    assert(got(2L) === ("see <URL> and <URL>", 0, 2, 0, false))
    assert(got(3L) === ("call <PHONE> now", 0, 0, 1, false))
    // URL redaction happens first, so its digit run is NOT a phone
    assert(got(4L) === ("digits inside <URL> stay a URL", 0, 1, 0, false))
    assert(got(5L) === ("clean", 0, 0, 0, true))
  }

  // ----------------------------------------------------------------- sources

  test("filterBySourceQuality drops whole low-quality sources, spares small ones") {
    val s = spark
    import s.implicits._
    val good = "a solid readable sentence with plenty of ordinary words in it"
    val bad = "x" * 30 // one giant token: fails mean-token-length
    val rows =
      (1 to 10).map(i => (i.toLong, s"$good number $i", "clean.example")) ++
      (11 to 20).map(i => (i.toLong, bad, "spam.example")) ++
      Seq((21L, bad, "tiny.example")) // below minDocs: kept despite quality
    val df = rows.toDF("id", "text", "src")
    val kept = graft.pipeline.Sources
      .filterBySourceQuality(df, "src", "text", minQualityRate = 0.5, minDocs = 5L)
      .select("src").distinct().collect().map(_.getString(0)).toSet
    assert(kept === Set("clean.example", "tiny.example"))
    val plan = graft.pipeline.Sources
      .filterBySourceQuality(df, "src", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "keep-filter should broadcast")
  }

  // ---------------------------------------------------------------- semdedup

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vec")
  }

  test("semanticDedup drops higher-id in-cluster near-dups, keeps the rest") {
    val v = vecs(
      (1L, Seq(1.0f, 0.5f, 0.0f)),
      (2L, Seq(1.0f, 0.5f, 0.0f)),    // copy of 1 -> dropped
      (3L, Seq(1.0f, 0.51f, 0.01f)),  // near-dup of 1 -> dropped at tau=0.999
      (4L, Seq(-1.0f, 0.5f, 0.0f)),   // different sign cluster
      (5L, Seq(0.0f, 1.0f, 0.0f)))    // same cluster as 1, far away
    val got = Dedup.semanticDedup(v, "id", "vec", Dedup.signCluster(col("vec"), 1),
        tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> true))
  }

  test("semanticDedup ignores cross-cluster near-dups (the SemDeDup approximation)") {
    // identical up to a sign flip in dim 1 -> different clusters, both kept
    val v = vecs(
      (1L, Seq(0.001f, 1.0f, 1.0f)),
      (2L, Seq(-0.001f, 1.0f, 1.0f)))
    val got = Dedup.semanticDedup(v, "id", "vec", Dedup.signCluster(col("vec"), 1),
        tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> true))
  }

  test("semanticDedup skips clusters above maxClusterSize; exact copies still drop") {
    // 3 DISTINCT near-dup vectors in one cluster, cap 2: pairwise skipped,
    // all representatives kept
    val v = vecs((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.001f)), (3L, Seq(1.0f, 0.002f)))
    val got = Dedup.semanticDedup(v, "id", "vec", Dedup.signCluster(col("vec"), 1),
        tau = 0.99, maxClusterSize = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true))
    // exact copies collapse BEFORE the cap (cosine exactly 1 needs no
    // pairwise pass): 3 copies + 1 distinct = 2 representatives <= cap,
    // copies drop, distinct reps survive the pairwise check
    val c = vecs((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(0.0f, 1.0f)))
    val got2 = Dedup.semanticDedup(c, "id", "vec", Dedup.signCluster(col("vec"), 1),
        tau = 0.99, maxClusterSize = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got2 === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("canaryHits: exact containment, multi-canary docs, no false hits") {
    import graft.pipeline.Decontaminate
    val v = docs(
      (1L, "ordinary text with no markers at all"),
      (2L, "leaked eval item CANARY-XYZ end"),
      (3L, "both CANARY-XYZ and MARKER-ABC appear"),
      (4L, "truncated CANARY-XY only"))  // prefix of the canary, not a containment hit
    val got = Decontaminate.canaryHits(v, "id", "text", Seq("CANARY-XYZ", "MARKER-ABC"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set((2L, 0, "CANARY-XYZ"), (3L, 0, "CANARY-XYZ"), (3L, 1, "MARKER-ABC")))
  }

  test("PROPERTY: semanticDedup matches a driver-side reference on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0 until 150).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val planted = (0 until 20).map(i => (1000L + i, base(i)._2)) // exact copies
    val all = base ++ planted
    val df = all.toDF("id", "vec").repartition(5)
    val tau = 0.95
    val got = Dedup.semanticDedup(df, "id", "vec", Dedup.signCluster(col("vec"), 3),
        tau = tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // driver-side reference: same sign clusters, all pairs, index-order
    // double cosine (the exact summation order Similarity.cosine uses)
    def cluster(v: Seq[Float]): Int =
      (0 until 3).map(i => if (v(i) >= 0) 1 << i else 0).sum
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = all.map { case (id, v) =>
      id -> !all.exists { case (id2, v2) =>
        id2 < id && cluster(v2) == cluster(v) && cos(v, v2) >= tau
      }
    }.toMap
    assert(got === expect)
    // every planted copy must be dropped (same cluster, cosine ~ 1)
    assert(planted.forall { case (id, _) => !got(id) })
  }

  test("semanticDedup works with IVF k-means cells as the clusterer (production path)") {
    import graft.pipeline.Similarity
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0 until 80).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val copies = (0 until 10).map(i => (900L + i, base(i)._2))
    val df = (base ++ copies).toDF("id", "vec")
    val (_, index) = Similarity.ivfBuild(df, "id", "vec", nCells = 8, iters = 1)
    // ivfBuild returns (id, vec, cell): feed the cell id straight in
    val got = Dedup.semanticDedup(index, "id", "vec", col("cell"), tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // identical vectors land in the same k-means cell -> every copy dropped
    (0 until 10).foreach { i =>
      assert(got(i.toLong) === true, s"original $i kept")
      assert(got(900L + i) === false, s"copy ${900 + i} dropped")
    }
  }

  test("semanticDedup cluster self-join carries ids only (no vectors)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val v = vecs((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.1f)))
    val df = Dedup.semanticDedup(v, "id", "vec", Dedup.signCluster(col("vec"), 1),
      tau = 0.99)
    // the within-cluster pair join (the one with the id1 < id2 condition)
    // must see bare (id, cluster) inputs; vectors re-join by id afterwards
    val pairJoins = df.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.condition.exists(_.toString.contains("<")) => j
    }
    assert(pairJoins.nonEmpty, "pair self-join not found in the plan")
    assert(pairJoins.forall(j => !j.inputSet.exists(_.name == "vec")),
      "raw vectors leaked into the within-cluster pair join")
  }

  test("Curation.run: semantic decon mode, deconGram switch, and the audit reports") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    val tOrig = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tRev  = tOrig.split(" ").reverse.mkString(" ")  // same token bag
    val v = Seq(
      (1L, tOrig, Array(1.0f, 0.0f, 0.0f)),
      (2L, tOrig, Array(1.0f, 0.0f, 0.0f)),   // exact copy: MinHash + SimHash pair
      (3L, tRev,  Array(0.0f, 1.0f, 0.0f)),   // reversed: SimHash-only pair (in_b only)
      (4L, "entirely different words compose this other document here now",
        Array(0.0f, 0.98f, 0.199f)),          // cos vs eval2 ~0.98 < tau
      (5L, "yet another unrelated page of plain prose for the corpus",
        Array(0.0f, 1.0f, 0.0f)))             // eval2 copy: semantic contamination
      .toDF("id", "text", "emb")
    val evalSet = Seq(
      Tuple1(Array(0.0f, 1.0f, 0.0f))).toDF("emb")
    val res = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, nearDupThreshold = Some(0.995),
        requireQuality = false, requireRepetitionOk = false,
        dedupAgreement = Some(Curation.AgreementConfig(maxHamming = 0)),
        semanticDecon = Some(Curation.SemanticDeconConfig("emb", "emb", tau = 0.995)),
        deconGram = false),  // eval frame has no text column: gram mode must not run
      evalSet = Some(evalSet), trackDrops = true)
    // near-dedup dropped the exact copy; semantic decon dropped both docs
    // whose embedding IS the eval vector (3 and 5); 4 sits at cos ~0.98 < tau
    assert(res.docs.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    val drops = res.drops.get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(drops === Map(2L -> "near_dedup", 3L -> "decon_semantic", 5L -> "decon_semantic"))
    // agreement report: (1,2) flagged by both; (1,3)/(2,3) SimHash-only
    val agree = res.audits("dedup_agreement").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(agree((1L, 2L)) === ((true, true)))
    assert(agree((1L, 3L)) === ((false, true)))
    assert(agree((2L, 3L)) === ((false, true)))
    assert(agree.size === 3)
    // the audit frames survive a clearCache (localCheckpoint, not lazy lineage)
    s.sharedState.cacheManager.clearCache()
    assert(res.audits("dedup_agreement").count() === 3L)
  }

  test("Curation.run: ANN near-dup stage with the standing recall audit") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val base = (0L until 40L).map(i => (i, s"doc $i body", vec(i.toInt)))
    // planted twin of doc 0 under id 100: cosine 1 — the only pair at 0.999
    val v = (base :+ ((100L, "twin body", vec(0)))).toDF("id", "text", "emb")
    val res = Curation.run(v, "id", "text",
      Curation.Config(exactDedup = false, requireQuality = false,
        requireRepetitionOk = false,
        embNearDup = Some(Curation.EmbNearDupConfig("emb", threshold = 0.999,
          planes = 4, bands = 8, recallAuditQueries = 5, recallAuditK = 3))),
      trackDrops = true)
    // the twin (larger id) dropped at the ANN stage
    assert(res.drops.get.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((100L, "emb_near_dedup")))
    // recall audit: 5 query rows (smallest ids), n_exact = k, n_hit <= n_exact
    val audit = res.audits("ann_recall").collect()
    assert(audit.map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L, 4L))
    assert(audit.forall(r => r.getLong(1) === 3L && r.getLong(2) <= 3L && r.getLong(2) >= 0L))
    // query 0's planted twin shares every LSH bucket: it must be recalled
    val q0 = audit.find(_.getLong(0) === 0L).get
    assert(q0.getLong(2) >= 1L, "planted identical twin missed by the LSH audit path")
  }

  test("PROPERTY: Curation drops partition the input — disjoint from survivors, " +
      "exhaustive, single-attributed, stage names legal") {
    import graft.pipeline.Curation
    val s = spark
    import s.implicits._
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "plain", "prose", "words", "here")
    val rnd = new scala.util.Random(42)
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    // 60 docs: varied lengths, some exact dups, some near-dups (95% shared
    // prefix), a few PII carriers and short stubs
    val base = (0L until 40L).map { i =>
      val t = sentence(12 + rnd.nextInt(30))
      (i, if (i % 11 == 0) t + " mail bob@x.io" else t)
    }
    val dups = (0L until 10L).map(i => (100L + i, base(i.toInt)._2))
    val shorts = (0L until 10L).map(i => (200L + i, sentence(1 + rnd.nextInt(3))))
    val input = (base ++ dups ++ shorts).toDF("id", "text")
    val evalSet = Seq(Tuple1(base(5)._2), Tuple1(sentence(20))).toDF("text")
    val configs = Seq(
      Curation.Config(),
      Curation.Config(nearDupThreshold = Some(0.8), dropPii = true,
        dedupAgreement = Some(Curation.AgreementConfig(maxHamming = 3))),
      Curation.Config(exactDedup = false, langs = Set("en"),
        segDedup = Some(Curation.SegDedupConfig()), minTokens = 5),
      Curation.Config(c4Rules = Some(Curation.C4Config(minWords = 3, minLines = 1)),
        requireStructureOk = true, minTokensPermille = Some(200)))
    for ((cfg, ci) <- configs.zipWithIndex) {
      val res = Curation.run(input, "id", "text", cfg,
        evalSet = Some(evalSet), trackFunnel = true, trackDrops = true)
      val survivors = res.docs.select("id").collect().map(_.getLong(0)).toSet
      val dropRows = res.drops.map(_.collect().toSeq).getOrElse(Seq.empty)
      val dropped = dropRows.map(_.getLong(0))
      // single attribution: each dropped id appears exactly once
      assert(dropped.distinct.size === dropped.size, s"config $ci double-attributed")
      // disjoint + exhaustive: drops ∪ survivors == input ids exactly
      assert(dropped.toSet.intersect(survivors).isEmpty, s"config $ci overlap")
      assert(dropped.toSet ++ survivors === (0L until 40L).map(identity).toSet
        ++ (100L until 110L) ++ (200L until 210L), s"config $ci lost ids")
      // every attribution names a stage the funnel actually ran
      val ranStages = res.stageCounts.map(_._1).toSet
      assert(dropRows.map(_.getString(1)).toSet.subsetOf(ranStages),
        s"config $ci attributed to a stage that never ran")
      // funnel monotone non-increasing for drop-only stages (all of these)
      val funnelVals = res.stageCounts.map(_._2)
      assert(funnelVals.zip(funnelVals.tail).forall { case (a, b) => b <= a },
        s"config $ci funnel grew: ${res.stageCounts}")
    }
  }
}
