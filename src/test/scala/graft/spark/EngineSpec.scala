package graft.spark

import graft.condition.Conditions
import graft.engine._
import graft.pipeline.{Dedup, Similarity}
import graft.resolve.ResolveEngine
import graft.streaming.{Databus, Subscription}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.DataFrame

  private def changesDf(rows: Seq[(String, String, Long, Long, String, String, Seq[String])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("table", "key", "ms", "seq", "node", "delta", "tags")
  }

  test("batch resolve folds deltas in changeId order regardless of input order") {
    // deliberately out of order input
    val changes = changesDf(Seq(
      ("t", "k1", 3000L, 0L, "n", "~", Seq.empty),
      ("t", "k1", 1000L, 0L, "n", """{"name":"Bob","rating":3}""", Seq.empty),
      ("t", "k1", 4000L, 0L, "n", """{..,"state":"APPROVED"}""", Seq.empty),
      ("t", "k1", 2000L, 0L, "n", """{..,"rating":4}""", Seq.empty),
      ("t", "k2", 1000L, 0L, "n", """{"x":1}""", Seq("a"))))
    val docs = ResolveEngine.resolve(changes).collect().sortBy(_.id)
    assert(docs.length === 2)
    val k1 = docs(0)
    assert(k1.version === 4 && !k1.deleted)
    assert(k1.body === """{"state":"APPROVED"}""")
    assert(k1.first_update_ms === 1000L && k1.last_update_ms === 4000L)
    val k2 = docs(1)
    assert(k2.version === 1 && k2.body === """{"x":1}""" && k2.last_tags === Seq("a"))
  }

  test("resolve marks deleted docs and excludes them when asked") {
    val changes = changesDf(Seq(
      ("t", "k1", 1000L, 0L, "n", """{"x":1}""", Seq.empty),
      ("t", "k1", 2000L, 0L, "n", "~", Seq.empty),
      ("t", "k2", 1000L, 0L, "n", """{"x":2}""", Seq.empty)))
    assert(ResolveEngine.resolve(changes).collect().count(_.deleted) === 1)
    assert(ResolveEngine.resolve(changes, includeDeleted = false).collect().map(_.id).toSeq === Seq("k2"))
  }

  test("FUZZ: compiled conditions equal the parity evaluator on 150 random trees") {
    val s = spark
    import s.implicits._
    import graft.json._
    val rnd = new scala.util.Random(4242)
    val rows = (1L to 40L).map { i =>
      (i,
        if (i % 7 == 0) null else s"name${i % 5}",
        (i % 9) * 1.5 - 3.0,
        if (i % 11 == 0) Seq[String](null)
        else Seq.tabulate((i % 4).toInt)(j => s"t${(i + j) % 5}"))
    }
    val df = rows.toDF("id", "name", "score", "tags")
    val fields = Seq("id", "name", "score", "tags", "missing")
    def jl(): String = rnd.nextInt(6) match {
      case 0 => (rnd.nextInt(10) + 1).toString
      case 1 => s"${rnd.nextInt(5)}.5"
      case 2 => "\"name" + rnd.nextInt(5) + "\""
      case 3 => "\"t" + rnd.nextInt(5) + "\""
      case 4 => "null"
      case _ => "true"
    }
    def leaf(): String = rnd.nextInt(13) match {
      case 0 => jl()
      case 1 => s"in(${jl()},${jl()})"
      case 2 => Seq("~", "+", "is(null)", "is(string)", "is(num)",
        "is(array)", "is(bool)")(rnd.nextInt(7))
      case 3 => s"gt(${rnd.nextInt(10)})"
      case 4 => s"le(${rnd.nextInt(8)}.5)"
      case 5 => "like(\"*a*\")"
      case 6 => "like(\"name*\")"
      case 7 => s"contains(${jl()})"
      case 8 => s"containsAny(${jl()},${jl()})"
      // the subtlest compiled branches: ALL needs every literal contained
      // (null members via exists), ONLY adds the array_distinct size count
      case 9  => s"containsAll(${jl()},${jl()})"
      case 10 => s"containsOnly(${jl()})"
      case 11 => s"ge(${rnd.nextInt(10)})"
      case _  => s"lt(${rnd.nextInt(8)}.5)"
    }
    def fieldCond(): String = {
      val f = fields(rnd.nextInt(fields.size))
      val sub = rnd.nextInt(3) match {
        case 0 => leaf()
        case 1 => s"not(${leaf()})"
        case _ => s"or(${leaf()},${leaf()})"
      }
      s"""{..,"$f":$sub}"""
    }
    def gen(depth: Int): String =
      if (depth == 0) fieldCond()
      else rnd.nextInt(4) match {
        case 0 => s"and(${gen(depth - 1)},${gen(depth - 1)})"
        case 1 => s"or(${gen(depth - 1)},${gen(depth - 1)})"
        case 2 => s"not(${gen(depth - 1)})"
        case _ => fieldCond()
      }
    def rowJson(r: org.apache.spark.sql.Row): JValue = JObj(Map(
      "id" -> JLong(r.getLong(0)),
      "name" -> (if (r.isNullAt(1)) JNull else JString(r.getString(1))),
      "score" -> JDouble(r.getDouble(2)),
      "tags" -> JArr(r.getSeq[String](3).map(t =>
        if (t == null) JNull else JString(t)).toVector)))
    val collected = df.collect()
    var checked = 0
    for (_ <- 1 to 150) {
      val text = gen(2)
      val cond = Conditions.fromString(text)
      val compiledIds =
        try Some(df.where(ConditionCompiler.compileRow(cond, df))
          .select("id").collect().map(_.getLong(0)).toSet)
        catch { case _: UnsupportedOperationException => None } // legit fallback
      compiledIds.foreach { ids =>
        checked += 1
        val expected = collected.filter(r =>
          graft.condition.ConditionEvaluator.eval(cond, rowJson(r)))
          .map(_.getLong(0)).toSet
        assert(ids === expected, s"condition: $text")
      }
    }
    assert(checked >= 140, s"too many trees skipped: $checked") // fuzz must bite
  }

  test("FUZZ: compiled conditions match parity on UNICODE data and literals") {
    val s = spark
    import s.implicits._
    import graft.json._
    // the ASCII fuzz above never crosses the UTF-8/UTF-16 order divergence
    // (chars >= U+0080, and the demote-to-parity path for literals >=
    // U+D800); this variant puts surrogate pairs, combining marks and
    // boundary code points in BOTH the data and the condition literals
    val uniPool = Vector("a", "\u00e9", "e\u0301", "\u00c9lan", "\ud83d\ude00",
      "\ud7ff", "z\uffff", "\ud83d\ude00tail", "ascii", "\u07ff\u0800")
    val rnd = new scala.util.Random(777)
    val rows = (1L to 40L).map { i =>
      (i,
        if (i % 7 == 0) null else uniPool((i % uniPool.size).toInt),
        Seq.tabulate((i % 4).toInt)(j => uniPool(((i + j) % uniPool.size).toInt)))
    }
    val df = rows.toDF("id", "name", "tags")
    def lit(): String = {
      val sl = uniPool(rnd.nextInt(uniPool.size))
      "\"" + sl.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
      } + "\""
    }
    def leaf(): String = rnd.nextInt(8) match {
      case 0 => lit()
      case 1 => s"in(${lit()},${lit()})"
      case 2 => s"gt(${lit()})"
      case 3 => s"le(${lit()})"
      case 4 => s"contains(${lit()})"
      case 5 => s"containsAny(${lit()},${lit()})"
      case 6 => "like(\"*é*\")"
      case _ => "like(\"😀*\")"
    }
    def fieldCond(): String = {
      val f = Seq("name", "tags")(rnd.nextInt(2))
      s"""{..,"$f":${if (rnd.nextBoolean()) leaf() else s"not(${leaf()})"}}"""
    }
    def rowJson(r: org.apache.spark.sql.Row): JValue = JObj(Map(
      "id" -> JLong(r.getLong(0)),
      "name" -> (if (r.isNullAt(1)) JNull else JString(r.getString(1))),
      "tags" -> JArr(r.getSeq[String](2).map(JString(_)).toVector)))
    val collected = df.collect()
    var checked = 0
    for (_ <- 1 to 200) {
      val text = (1 to 2).map(_ => fieldCond()).mkString("or(", ",", ")")
      val cond = Conditions.fromString(text)
      val compiled =
        try Some(df.where(graft.engine.ConditionCompiler.compileRow(cond, df))
          .select("id").collect().map(_.getLong(0)).toSet)
        catch { case _: UnsupportedOperationException => None } // demote = legit
      compiled.foreach { ids =>
        checked += 1
        val expected = collected.filter(r =>
          graft.condition.ConditionEvaluator.eval(cond, rowJson(r)))
          .map(_.getLong(0)).toSet
        assert(ids === expected, s"condition: $text")
      }
    }
    assert(checked >= 100, s"fuzz must bite: $checked") // demotes can't eat the run
  }

  test("map-condition on a MapType column refuses native compile (parity path)") {
    val s = spark
    import s.implicits._
    // a MapType column IS a JSON object: compiling {..} against it to
    // constant false silently dropped matching rows — it must throw so
    // fallback-capable callers demote to the exact parity evaluator
    val df = Seq((1L, Map("a" -> 1L))).toDF("id", "attrs")
    val cond = graft.condition.Conditions.fromString("""{..,"attrs":{..,"a":1}}""")
    intercept[UnsupportedOperationException](
      graft.engine.ConditionCompiler.compileRow(cond, df))
    // non-object scalar columns still compile (to never-matching), as before
    val df2 = Seq((1L, 5L)).toDF("id", "attrs")
    assert(df2.where(graft.engine.ConditionCompiler.compileRow(cond, df2)).count() === 0)
  }

  test("compiled array conditions: null elements and null literals (parity)") {
    val s = spark
    import s.implicits._
    import graft.json._
    val df = Seq(
      (1L, Seq("a", null)),
      (2L, Seq("a")),
      (3L, Seq[String](null)),
      (4L, Seq.empty[String])).toDF("id", "tags")
    val conds = Seq(
      """{..,"tags":containsAll("a",null)}""", // null is a legal member
      """{..,"tags":containsAny(null)}""",
      """{..,"tags":containsOnly("a",null)}""",
      """{..,"tags":containsOnly(null)}""",
      """{..,"tags":[null]}""",                // array equality with null
      """{..,"tags":["a",null]}""")
    for (condText <- conds) {
      val cond = Conditions.fromString(condText)
      val compiled = df.where(ConditionCompiler.compileRow(cond, df))
        .select("id").collect().map(_.getLong(0)).toSet
      val expected = df.collect().filter { r =>
        val json = JObj(Map(
          "id" -> JLong(r.getLong(0)),
          "tags" -> JArr(r.getSeq[String](1).map(t =>
            if (t == null) JNull else JString(t)).toVector)))
        graft.condition.ConditionEvaluator.eval(cond, json)
      }.map(_.getLong(0)).toSet
      assert(compiled === expected, s"condition: $condText")
    }
  }

  test("ANSI-safe Java-abs parity and partition guards") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.lit
    // Spark's checked abs throws on Int.MinValue under ANSI; the guard
    // must return it unchanged (Math.abs parity) and stay exact elsewhere
    val r = Seq(1).toDF("x").select(
      expressions.absJava(lit(Int.MinValue)).as("m"),
      expressions.absJava(lit(-5)).as("n"),
      expressions.absJava(lit(7)).as("p")).head()
    assert(r.getInt(0) === Int.MinValue && r.getInt(1) === 5 && r.getInt(2) === 7)
    // partition(0: ...) rejects at construction (PartitionConditionImpl
    // parity), not with a modulo-by-zero on every executor
    intercept[IllegalArgumentException] {
      graft.delta.DslParser.parseCondition("partition(0:1)")
    }
  }

  test("partial-intrinsics parity eval rejects unavailable intrinsics loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(("""{"a":1}""", "k1", "t1")).toDF("body", "id", "table")
    // ~id/~table are fine with the 3-child form
    val ok = df.select(expressions.emoCondEval(
      """intrinsic("~table":"t1")""", col("body"), col("id"), col("table")))
      .head().getBoolean(0)
    assert(ok)
    // ~deleted would silently evaluate against a fabricated false — must throw
    val e = intercept[Exception] {
      df.select(expressions.emoCondEval(
        """intrinsic("~deleted":true)""", col("body"), col("id"), col("table")))
        .collect()
    }
    assert(e.getMessage != null) // wrapped SparkException carries the require text
  }

  test("string comparisons crossing the UTF-8/UTF-16 boundary demote to the parity path") {
    val s = spark
    import s.implicits._
    val ms = 1700000000000L
    val df = Seq(("t", "😀", "sig", false, ms, ms, ms, "p", """{"a":1}"""))
      .toDF("table", "id", "signature", "deleted", "first_update_ms",
        "last_update_ms", "last_mutate_ms", "placement", "body")
    // Java (reference) order: U+D83D < U+E000 -> gt is FALSE; UTF-8 byte
    // order would say the emoji is GREATER — the predicate must follow the
    // parity evaluator by demoting the conjunct
    val kept = df.where(EmoDocs.predicate(df, "intrinsic(\"~id\":gt(\"\"))"))
    assert(kept.count() === 0L)
    // and the safe-side literal stays on the fast native path
    val kept2 = df.where(EmoDocs.predicate(df, """intrinsic("~id":gt("a"))"""))
    assert(kept2.count() === 1L)
  }

  test("compiled conditions match the parity evaluator on typed rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "aaa", 3.5, Seq("x", "y")),
      (2L, "bbb", 25.0, Seq("y")),
      (3L, "review", 100.0, Seq.empty[String]),
      (4L, "zzz", -1.0, Seq("x", "z")),
      (5L, null, 7.0, Seq("x"))).toDF("id", "name", "score", "tags")

    val conds = Seq(
      """{..,"id":in(1,3),"name":like("*a*")}""",
      """{..,"score":ge(25)}""",
      """{..,"score":gt(3.4),"name":lt("c")}""",
      """{..,"tags":contains("x")}""",
      """{..,"tags":containsAny("z","q")}""",
      """{..,"tags":containsOnly("y")}""",
      """or({..,"name":"review"},not({..,"id":le(2)}))""",
      """{..,"id":3}""",
      """{..,"id":3.0}""",       // type-strict: never matches a long column
      """{..,"missing":~}""",    // missing column is UNDEFINED
      """{..,"missing":+}""",
      """{..,"name":is(null)}""",
      """not({..,"name":like("a*")})""", // null name: like=false, not=true
      """{..,"name":not(like("a*"))}""")

    import graft.json._
    for (condText <- conds) {
      val cond = Conditions.fromString(condText)
      val compiled = df.where(ConditionCompiler.compileRow(cond, df))
        .select("id").collect().map(_.getLong(0)).toSet
      val expected = df.collect().filter { r =>
        val json = JObj(Map(
          "id" -> JLong(r.getLong(0)),
          "name" -> (if (r.isNullAt(1)) JNull else JString(r.getString(1))),
          "score" -> JDouble(r.getDouble(2)),
          "tags" -> JArr(r.getSeq[String](3).map(JString(_)).toVector)))
        graft.condition.ConditionEvaluator.eval(cond, json)
      }.map(_.getLong(0)).toSet
      assert(compiled === expected, s"condition: $condText")
    }
  }

  test("emoPartition column matches the scala hash") {
    val s = spark
    import s.implicits._
    val df = Seq(("review", "abc"), ("review", "def"), ("t2", "k")).toDF("table", "id")
    val got = df.select(col("id"), expressions.emoPartition(col("table"), col("id"), 8))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("abc") === graft.json.Hashes.partitionOf("review", "abc", 8))
    assert(got("def") === graft.json.Hashes.partitionOf("review", "def", 8))
    assert(got("k") === graft.json.Hashes.partitionOf("t2", "k", 8))
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tonight")
    val other = "completely different content about spark catalyst optimizer internals"
    val df = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDuplicates(df, "doc_id", "text",
      shingleN = 2, k = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedup guardrails: band invariants enforced, bands=1 works, " +
       "null/short docs handled") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
                 (2L, "alpha beta gamma delta epsilon zeta eta theta"),
                 (3L, "totally different content about other things entirely"))
      .toDF("doc_id", "text")
    // bands > k previously made rowsPerBand 0: every band key hashed an
    // empty slice, everything bucket-collided, and the cap silently
    // dropped ALL pairs — now it fails loudly
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDuplicates(df, "doc_id", "text", k = 8, bands = 16)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(df, "doc_id", "text", bands = 3) // !| 64
    }
    // bands=1 (width=64): the old (1L << 64) - 1 mask overflowed to 0 and
    // collapsed every fingerprint into one dropped bucket — the identical
    // pair must be found via its full-fingerprint band key
    val b1 = Dedup.simhashCandidates(df, "doc_id", "text", bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 === Set((1L, 2L)))
    // docs below shingleN tokens zero-fill their signatures: they must
    // neither pair with each other nor consume the bucket cap
    val shorts = Seq((1L, "one"), (2L, "two"), (3L, "x")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDuplicates(shorts, "doc_id", "text",
      shingleN = 3).count() === 0L)
    // null texts are not comparable: they form no duplicate group and
    // survive dropExactDuplicates untouched
    val withNulls = Seq((1L, Some("same text")), (2L, Some("same text")),
      (3L, Option.empty[String]), (4L, Option.empty[String])).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(withNulls, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
    // builtin minhashSignature zero-fills empty shingle sets (identity
    // with the single-pass expression, which zero-fills)
    val sig = Seq(Tuple1("x")).toDF("text")
      .select(Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), 4))
      .head().getSeq[Long](0)
    assert(sig === Seq(0L, 0L, 0L, 0L))
  }

  test("simhash: identical docs have hamming 0, unrelated docs don't collide") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated words appear here now")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 8)
  }

  test("simhash candidates: degenerate buckets are capped like minhash") {
    val s = spark
    import s.implicits._
    // 40 identical boilerplate docs (one degenerate bucket per band) + one
    // planted near-dup pair of distinct content
    val spam = (1L to 40L).map(i => (i, "click here to unsubscribe from this newsletter"))
    val pair = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
                   (101L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (spam ++ pair).toDF("doc_id", "text")
    // uncapped: the spam bucket contributes 40*39/2 = 780 pairs
    val uncapped = Dedup.simhashCandidates(df, "doc_id", "text", bands = 4,
      maxBucketSize = 10000).count()
    assert(uncapped >= 780)
    // capped at 10: spam buckets (size 40) are dropped entirely; the planted
    // pair (bucket size 2) survives — bounded candidate count
    val capped = Dedup.simhashCandidates(df, "doc_id", "text", bands = 4,
      maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)))
  }

  test("LSH similarity search recalls most brute-force top-k") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // wide buckets (4-bit bands) because the synthetic embeddings are near-
    // uniform random: collision probability per band must stay high
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      planes = 4, bands = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("sketch expression/builtin parity holds on boundary whitespace") {
    val s = spark
    import s.implicits._
    import graft.pipeline.sketches
    // trailing '\n' survives the space-only trim and the builtin split
    // keeps its trailing empty token; the JVM tokenizer must too (limit -1)
    // or every sketch/count disagrees between the two paths on such docs
    val docs = Seq("hello world\n", "\tleading tab", "a  b ", "", " ", "one\n\n")
      .toDF("text")
    val sh = docs.select(
      sketches.simhash64(col("text")).as("fast"),
      Dedup.simhash64Builtin(col("text")).as("slow")).collect()
    sh.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val mh = docs.select(
      sketches.minhash(col("text"), 2, 8).as("fast"),
      Dedup.minhashSignature(Dedup.wordShingles(col("text"), 2), 8).as("slow")).collect()
    mh.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("single-pass sketch expressions match their builtin formulations") {
    import graft.pipeline.sketches
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents").limit(50)
    // simhash: expression vs 64-aggregate builtin
    val sh = docs.select(
      sketches.simhash64(col("text")).as("fast"),
      Dedup.simhash64Builtin(col("text")).as("slow")).collect()
    sh.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // minhash: expression vs shingle+transform builtin
    val mh = docs.select(
      sketches.minhash(col("text"), 2, 16).as("fast"),
      Dedup.minhashSignature(Dedup.wordShingles(col("text"), 2), 16).as("slow")).collect()
    mh.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // hyperplane sketch: expression vs per-band builtin
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings").limit(20)
    val hp = emb.select(
      sketches.hyperplaneSketch(col("embedding"), 4, 3).as("fast"),
      array((0 until 3).map(b => Similarity.lshBucketBand(col("embedding"), 4, b)): _*).as("slow"))
      .collect()
    hp.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // hashed shingles: expression vs builtin chain (set equality)
    val hs = docs.select(
      sketches.hashedShingles(col("text"), 2).as("fast"),
      transform(Dedup.wordShingles(col("text"), 2), s => xxhash64(s)).as("slow")).collect()
    hs.foreach(r => assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet))
    // langId / qualityOk: expression vs builtin formulation
    import graft.pipeline.TextAnalysis
    val tq = docs.select(
      TextAnalysis.langId(col("text")).as("lfast"),
      TextAnalysis.langIdBuiltin(col("text")).as("lslow"),
      TextAnalysis.qualityOk(col("text")).as("qfast"),
      TextAnalysis.qualityOkBuiltin(col("text")).as("qslow"),
      TextAnalysis.qualityOk(col("text"), minTokens = 20).as("qfast20"),
      TextAnalysis.qualityOkBuiltin(col("text"), minTokens = 20).as("qslow20")).collect()
    tq.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getBoolean(2) === r.getBoolean(3))
      assert(r.getBoolean(4) === r.getBoolean(5))
    }
    // edge cases through both paths
    val s2 = spark
    import s2.implicits._
    val edge = Seq("", "   ", "der der der", "a.b,c;d:e!f?g", "the of and x y z t u v w").toDF("text")
    val e2 = edge.select(
      TextAnalysis.langId(col("text")).as("lfast"),
      TextAnalysis.langIdBuiltin(col("text")).as("lslow"),
      TextAnalysis.qualityOk(col("text"), minTokens = 2).as("qfast"),
      TextAnalysis.qualityOkBuiltin(col("text"), minTokens = 2).as("qslow")).collect()
    e2.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getBoolean(2) === r.getBoolean(3))
    }
  }

  test("IVF index recalls most brute-force top-k; embedding near-dup finds self-similar pairs") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (centroids, index) = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(centroids.size === 8)
    val ivf = Similarity.ivfTopK(centroids, index, queries, "vec_id", "embedding", 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")

    // near-dup: every duplicated vector must pair with its copy at cosine 1
    val s = spark
    import s.implicits._
    val dup = emb.where(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 100000)
    val withDups = emb.where(col("vec_id") < 50).unionByName(dup)
    val pairs = Similarity.embeddingNearDuplicates(withDups, "vec_id", "embedding",
      threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 100000L), (1L, 100001L), (2L, 100002L)))
  }

  test("PQ index: planted copies recalled exactly; ADC rerank recalls most exact top-k") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    // planted-copy exactness: each query's identical copy encodes to identical
    // codes, survives ADC candidate generation, and exact re-rank returns it
    val queries = emb.where(col("vec_id") < 5)
    val corpus = emb.unionByName(queries.withColumn("vec_id", col("vec_id") + 1000000L))
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    assert(books.size === 8 && books.forall(_.size === 16) &&
      books.forall(_.forall(_.size === 8)))
    val index = Similarity.pqIndex(corpus, "vec_id", "embedding", books)
    // codes are in-range small ints
    val codes = index.select("codes").limit(20).collect().map(_.getSeq[Int](0))
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    val top1 = Similarity.pqTopK(books, index, queries, "vec_id", "embedding",
        k = 1, rerank = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 === (0 until 5).map(i => (i.toLong, i + 1000000L)).toSet)

    // hard guarantee, independent of codebook quality: with rerank >= corpus
    // size every row survives ADC candidate generation and the exact re-rank
    // makes pqTopK IDENTICAL to brute force — deterministic on any host
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val natBooks = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val natIndex = Similarity.pqIndex(emb, "vec_id", "embedding", natBooks)
    val n = emb.count().toInt
    val full = Similarity.pqTopK(natBooks, natIndex, queries, "vec_id", "embedding",
        k = 5, rerank = n)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact, "pqTopK with rerank=corpus must equal brute force")

    // natural-corpus recall with a bounded rerank: training is deterministic
    // under any partitioning (decimal Lloyd means + farthest-point seeding),
    // so this number is stable across hosts
    val approx = Similarity.pqTopK(natBooks, natIndex, queries, "vec_id", "embedding",
        k = 5, rerank = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall too low: $recall")
  }

  test("IVF-PQ composed: planted copies recalled; full-probe full-rerank equals brute force") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where(col("vec_id") < 5)
    val corpus = emb.unionByName(queries.withColumn("vec_id", col("vec_id") + 1000000L))
    val (centroids, _) = Similarity.ivfBuild(corpus, "vec_id", "embedding", nCells = 8, iters = 1)
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val index = Similarity.ivfPqIndex(corpus, "vec_id", "embedding", centroids, books)
    // planted-copy exactness at operator defaults: the copy shares the
    // query's nearest cell (same assignment expression) and its codes, so
    // it survives probing + ADC and exact re-rank returns it at cosine 1.0
    val top1 = Similarity.ivfPqTopK(centroids, books, index, queries,
        "vec_id", "embedding", k = 1, nProbe = 4, rerank = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 === (0 until 5).map(i => (i.toLong, i + 1000000L)).toSet)
    // hard guarantee independent of codebook/centroid quality: probing
    // EVERY cell with rerank >= corpus size makes the composed operator
    // IDENTICAL to brute force over the same corpus
    val n = corpus.count().toInt
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.ivfPqTopK(centroids, books, index, queries,
        "vec_id", "embedding", k = 5, nProbe = centroids.size, rerank = n)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact, "ivfPqTopK with full probe + full rerank must equal brute force")
    // plan contract: candidate generation is a BROADCAST join on cell (the
    // corpus side never shuffles for probing) and the rank keeps the
    // shuffle-free bounded-heap phase
    val q2 = Similarity.ivfPqTopK(centroids, books, index, queries,
      "vec_id", "embedding", k = 1, nProbe = 4, rerank = 16)
    q2.collect()
    val plan = q2.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probed-cell join must broadcast the (query, cell) side:\n$plan")
    assert(plan.contains("MapPartitions"),
      s"candidate rank lost the shuffle-free local top-k phase:\n$plan")
  }

  test("sim_pq harness margin: planted copy's ADC rank has rerank/2 headroom at the correctness SF") {
    // mirrors SparkEntry's sim_pq fixture at the SF the driver verifies
    // (sf0.01): the oracle match relies on the planted copy SURVIVING ADC
    // candidate generation at rerank=64 — this pins the survival margin
    // (rank <= rerank/2), so a denser future corpus that erodes ADC
    // separation fails HERE loudly instead of flipping the oracle silently
    val emb = Tables.read(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val corpus = emb.unionByName(queries.withColumn("vec_id", col("vec_id") + 1000000L))
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val index = Similarity.pqIndex(corpus, "vec_id", "embedding", books)
    val rerank = 64
    val copyRanks = Similarity.pqAdcCandidates(books, index, queries,
        "vec_id", "embedding", rerank)
      .where(col("neighbor_id") === col("query_id") + 1000000L)
      .select("query_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 10L).foreach { q =>
      val r = copyRanks.getOrElse(q,
        fail(s"query $q: planted copy did not survive ADC candidate generation"))
      assert(r <= rerank / 2,
        s"query $q: planted copy's ADC rank $r has no headroom against rerank=$rerank")
    }
  }

  test("plan contract: ANN top-k ranks per (query, input-partition) first — no corpus-wide single-reducer sort") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where(col("vec_id") < 3)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val index = Similarity.pqIndex(emb, "vec_id", "embedding", books)
    val pq = Similarity.pqTopK(books, index, queries, "vec_id", "embedding", k = 3, rerank = 8)
    pq.collect()
    // (string match: AQE wraps the plan, hiding the tree from collect)
    val pqPlan = pq.queryExecution.executedPlan.toString
    // phase 1 is the shuffle-free per-partition bounded heap (MapPartitions
    // node): the corpus-sized ADC stream is pruned to <= k rows per (query,
    // partition) with NO exchange; the per-query window then ranks only the
    // survivors
    assert(pqPlan.contains("MapPartitions"),
      s"pqTopK lost the shuffle-free local top-k phase:\n$pqPlan")
    // raw vectors are NOT in the candidate rank stream — they re-join by id
    // after pruning, so the N×Q explode and both rank shuffles carry only
    // (query_id, neighbor_id, adc): no Generate node outputs the vec column
    val explodeLines = pqPlan.linesIterator.filter(_.contains("posexplode")).toSeq
    assert(explodeLines.nonEmpty && explodeLines.forall(l => !l.contains("vec#")),
      s"raw vectors leaked into the ADC explode stream:\n$pqPlan")

    val (centroids, ivfIdx) = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, iters = 1)
    val ivf = Similarity.ivfTopK(centroids, ivfIdx, queries, "vec_id", "embedding", 3, nProbe = 2)
    ivf.collect()
    val ivfPlan = ivf.queryExecution.executedPlan.toString
    assert(ivfPlan.contains("MapPartitions"),
      s"ivfTopK lost the shuffle-free local top-k phase:\n$ivfPlan")
  }

  test("fanout: native-compiled predicates agree with the parity evaluator") {
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val subs = Seq(
      Subscription("a", """{..,"~tags":contains("purchase")}"""),
      Subscription("b", """intrinsic("~id":"3")"""),
      Subscription("c", """and({..,"~tags":containsAny("error","view")},intrinsic("~table":like("ev*")))"""))
    val out = Databus.fanout(changes, subs)
      .groupBy("subscription").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent truth via direct filters
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(out("a") === ev.where(col("event_type") === "purchase").count())
    assert(out("b") === ev.where(col("user_id") === 3).count())
    assert(out("c") === ev.where(col("event_type").isin("error", "view")).count())
  }

  test("compaction folds under the caller's placement (conditional deltas)") {
    import graft.resolve.{ChangeRow, Compactor}
    val s = spark
    import s.implicits._
    val df = Seq(
      ChangeRow("t", "k", 1000L, 1L, "n1", """{"v":1}""", Seq.empty),
      ChangeRow("t", "k", 2000L, 2L, "n2",
        """if intrinsic("~placement":"eu") then {..,"region":"eu"} else {..,"region":"other"} end""",
        Seq.empty),
      ChangeRow("t", "k", 3000L, 3L, "n3", """{..,"v":2}""", Seq.empty)).toDF()
    val direct = ResolveEngine.resolve(df, placement = "eu").collect().head
    assert(direct.body.contains("\"region\":\"eu\""))
    // the checkpoint must bake the SAME branch the deployment resolves
    val viaCompact = ResolveEngine.resolve(
      Compactor.compact(df, cutoffMs = 2500, placement = "eu"),
      placement = "eu").collect().head
    assert(viaCompact.body === direct.body)
    assert(viaCompact.signature === direct.signature)
    // the default-placement fold bakes the WRONG branch — the divergence
    // the placement parameter exists to prevent
    val wrong = ResolveEngine.resolve(Compactor.compact(df, cutoffMs = 2500),
      placement = "eu").collect().head
    assert(wrong.body != direct.body)
  }

  test("compaction invariant: resolve(compact(log, cutoff)) == resolve(log)") {
    import graft.resolve.Compactor
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val cutoff = 1705000000000L // mid-range of the event timestamps
    val before = ResolveEngine.resolve(changes).collect()
      .map(d => d.id -> (d.body, d.version, d.deleted, d.first_update_ms, d.last_update_ms, d.last_mutate_ms, d.signature))
      .toMap
    val compacted = Compactor.compact(changes, cutoff)
    // the compacted log is strictly smaller but resolves identically —
    // INCLUDING ~signature (the optimistic-concurrency token): the cutoff
    // signature rides in the checkpoint row and is restored verbatim
    assert(compacted.count() < changes.count())
    val after = ResolveEngine.resolve(compacted).collect()
      .map(d => d.id -> (d.body, d.version, d.deleted, d.first_update_ms, d.last_update_ms, d.last_mutate_ms, d.signature))
      .toMap
    assert(after === before)
    // delete-heavy log: tombstones survive compaction
    val delChanges = EventLog.deleteOnErrorChanges(spark, "/root/testdata/sf0.001")
    val b2 = ResolveEngine.resolve(delChanges).collect().map(d => d.id -> (d.body, d.version, d.deleted)).toMap
    val a2 = ResolveEngine.resolve(Compactor.compact(delChanges, cutoff)).collect()
      .map(d => d.id -> (d.body, d.version, d.deleted)).toMap
    assert(a2 === b2)
  }

  test("PROPERTY: compaction invariance on random logs and cutoffs") {
    import graft.resolve.{ChangeRow, Compactor}
    val s = spark
    import s.implicits._
    val deltaPool = Seq("""{"a":1}""", """{..,"b":2}""", "~", """{..,"a":~}""",
      """{..,"n":if or(is(undefined),lt(5)) then 5 end}""", """{..,"s":(..,"x")}""",
      """{..,"t":"hi"}""", "..", """{..,"c":{"d":[1,2]}}""",
      """{..,"m":{..,"inner":3}}""")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val rows = (1 to (5 + rnd.nextInt(25))).map { _ =>
        ChangeRow("t", s"k${rnd.nextInt(3)}", 1000L * (1 + rnd.nextInt(10)),
          rnd.nextInt(5).toLong, s"n${rnd.nextInt(2)}",
          deltaPool(rnd.nextInt(deltaPool.size)), Seq.empty)
      }.distinctBy(r => (r.key, r.ms, r.seq, r.node))
      val df = rows.toDF()
      val cutoff = 1000L * (1 + rnd.nextInt(10))
      val before = ResolveEngine.resolve(df).collect()
        .map(d => d.id -> (d.body, d.version, d.signature, d.deleted,
          d.first_update_ms, d.last_update_ms, d.last_mutate_ms)).toMap
      val viaCompact = ResolveEngine.resolve(Compactor.compact(df, cutoff)).collect()
        .map(d => d.id -> (d.body, d.version, d.signature, d.deleted,
          d.first_update_ms, d.last_update_ms, d.last_mutate_ms)).toMap
      assert(viaCompact === before, s"cutoff=$cutoff rows=${rows.size}")
      val viaHot = ResolveEngine.resolve(
          Compactor.compactHot(df, cutoff, threshold = 5)).collect()
        .map(d => d.id -> (d.body, d.version, d.signature, d.deleted,
          d.first_update_ms, d.last_update_ms, d.last_mutate_ms)).toMap
      assert(viaHot === before, s"hot cutoff=$cutoff rows=${rows.size}")
    }
  }

  test("compaction checkpoints: out-of-band marker, any-position restore") {
    import graft.resolve.{ChangeRow, Compactor}
    val s = spark
    import s.implicits._
    // a producer whose node id starts with "compaction:" is an ORDINARY
    // change (detection keys on the reserved delta prefix, not the node) —
    // unless it matches the exact legacy all-numeric 4-field checkpoint
    // shape, which fails loudly (see the legacy-checkpoint test)
    val odd = Seq(
      ChangeRow("t", "k1", 1000L, 0L, "compaction:node-9", """{..,"a":1}""", Seq()),
      ChangeRow("t", "k1", 2000L, 0L, "node-b", """{..,"b":2}""", Seq()))
      .toDF()
    val doc = ResolveEngine.resolve(odd).collect().head
    assert(doc.version === 2L)
    assert(doc.body.contains("\"a\":1") && doc.body.contains("\"b\":2"))

    // a late-arriving change ordering BEFORE the checkpoint is superseded by
    // it: the checkpoint restores at its position, not only at row 1
    val base = Seq(
      ChangeRow("t", "k2", 1000L, 0L, "n1", """{..,"x":1}""", Seq()),
      ChangeRow("t", "k2", 3000L, 0L, "n2", """{..,"y":2}""", Seq()))
      .toDF()
    val compacted = Compactor.compact(base, cutoffMs = 3500L)
    val late = Seq(ChangeRow("t", "k2", 500L, 0L, "n0", """{..,"late":true}""", Seq())).toDF()
    val withLate = compacted.unionByName(late)
    val expect = ResolveEngine.resolve(base).collect().head
    val got = ResolveEngine.resolve(withLate).collect().head
    assert(got.version === expect.version)
    assert(got.signature === expect.signature)
    assert(got.body === expect.body)

    // periodic compaction: compacting an already-compacted log (checkpoint
    // inside the new prefix) folds the checkpoint and re-checkpoints,
    // preserving version/signature/content
    val tail = Seq(
      ChangeRow("t", "k2", 5000L, 0L, "n3", """{..,"z":3}""", Seq()),
      ChangeRow("t", "k2", 9000L, 0L, "n4", """{..,"x":9}""", Seq())).toDF()
    val full = base.unionByName(tail)
    val twice = Compactor.compact(compacted.unionByName(tail), cutoffMs = 6000L)
    assert(twice.count() === 2) // one new checkpoint + the 9000ms tail
    val expectFull = ResolveEngine.resolve(full).collect().head
    val gotTwice = ResolveEngine.resolve(twice).collect().head
    assert(gotTwice.version === expectFull.version)
    assert(gotTwice.signature === expectFull.signature)
    assert(gotTwice.body === expectFull.body)

    // a checkpoint row with a corrupt node field fails loudly
    val corrupt = Seq(ChangeRow("t", "k3", 1000L, 0L, "not-a-checkpoint",
      ResolveEngine.CheckpointDeltaPrefix.toString + "{}", Seq())).toDF()
    val e = intercept[org.apache.spark.SparkException] {
      ResolveEngine.resolve(corrupt).collect()
    }
    assert(e.getMessage.contains("corrupt compaction checkpoint") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt compaction checkpoint")))
  }

  test("doc store: partition pruning reads only matching directories") {
    import graft.engine.DocStore
    val docs = ResolveEngine.resolve(
      graft.engine.EventLog.placementChanges(spark, "/root/testdata/sf0.001")).toDF()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_store_test"
    DocStore.write(docs, path)
    val full = DocStore.read(spark, path)
    val allFiles = full.inputFiles.length

    // files actually read = the scan node's numFiles metric post-pruning
    // (inputFiles reports the relation's full listing, pre-pruning)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
    }

    // table pruning: only the orders directories are read
    val tableScan = DocStore.scan(spark, path, """intrinsic("~table":"orders")""")
    assert(filesRead(tableScan) < allFiles)
    assert(tableScan.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains("table=orders")))
    assert(tableScan.count() ===
      docs.where(col("table") === "orders").count())

    // partition(N:...) pruning with N | 16: part IN (mapped subset)
    val partScan = DocStore.scan(spark, path, "partition(4:2)")
    val partFiles = filesRead(partScan)
    assert(partFiles > 0 && partFiles < allFiles)
    // 4-partition 2 maps to 16-partitions {2, 6, 10, 14}
    assert(partScan.queryExecution.sparkPlan.toString.contains("PartitionFilters"))
    // pruning is sound: same rows as the unpruned exact filter
    val expected = graft.engine.EmoDocs.whereDf(full, "partition(4:2)")
      .selectExpr("table", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = partScan.selectExpr("table", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected && got.nonEmpty)

    // the 4-way partition cover is exact and disjoint
    val cover = (1 to 4).map(p => DocStore.scan(spark, path, s"partition(4:$p)").count()).sum
    assert(cover === full.count())

    // unprunable forms still answer correctly (negation scans everything)
    val notScan = DocStore.scan(spark, path, """not(intrinsic("~table":"orders"))""")
    assert(notScan.count() === docs.where(col("table") =!= "orders").count())

    // EXACT pruning carries no row-level condition re-filter: the
    // table+partition condition is a pure function of the partition
    // columns, so the plan must not evaluate the partition hash per row
    val exactScan = DocStore.scan(spark, path,
      """and(intrinsic("~table":"orders"),partition(4:2))""")
    val planStr = exactScan.queryExecution.executedPlan.toString
    assert(!planStr.contains("EmoHash32") && !planStr.contains("EmoCondEval"),
      "exact-prunable scan still re-evaluates the condition per row")
    assert(exactScan.count() ===
      graft.engine.EmoDocs.whereDf(full,
        """and(intrinsic("~table":"orders"),partition(4:2))""").count())

    // an inexact conjunction (body predicate attached) keeps the re-filter
    val mixedScan = DocStore.scan(spark, path,
      """and(intrinsic("~table":"orders"),partition(4:2),{..,"status":"F"})""")
    assert(mixedScan.count() <= exactScan.count())
  }

  test("bucketed doc store joins without shuffling the store side") {
    import graft.engine.DocStore
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = ResolveEngine.resolve(
      graft.engine.EventLog.changes(spark, "/root/testdata/sf0.001")).toDF()
    // a previous JVM's managed-table dir survives while the fresh catalog
    // forgot the table — clear both before writing (at the session's ACTUAL
    // warehouse: whichever spec created the shared session fixed it)
    spark.sql("DROP TABLE IF EXISTS bucketed_docs_test")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val orphan = new java.io.File(s"$warehouse/bucketed_docs_test")
    if (orphan.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(orphan)
    }
    DocStore.writeBucketed(docs, "bucketed_docs_test", buckets = 4)
    val store = spark.table("bucketed_docs_test")

    // self-join on the bucket key: both sides reuse the bucket partitioning
    val joined = store.as("a").join(store.as("b"), "id")
      .select(col("a.id"), col("a.version"), col("b.signature"))
    joined.collect()
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed self-join should not shuffle, found: ${shuffles.size}")
    assert(joined.count() === docs.count())

    // aggregation on the bucket key is also exchange-free
    val agg = store.groupBy("id").agg(max("version").as("v"))
    agg.collect()
    val aggShuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(aggShuffles.isEmpty)
  }

  test("deployment tuning applies runtime-settable conf") {
    import graft.engine.Deploy
    val conf = Deploy.recommendedConf(totalCores = 4000)
    assert(conf("spark.sql.shuffle.partitions") === "8000")
    assert(conf("spark.sql.adaptive.skewJoin.enabled") === "true")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Deploy.tune(spark, totalCores = 8)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "16")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("targeted compaction checkpoints only hot logs; delta export filters by mutate time") {
    import graft.resolve.Compactor
    import org.apache.spark.sql.Encoders
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val threshold = 40L
    val hotN = Compactor.skewReport(changes, threshold).count()
    assert(hotN > 0)
    val compacted = Compactor.compactHot(changes, cutoffMs = Long.MaxValue, threshold)
    // cold logs untouched, hot logs collapse to one checkpoint row each
    val coldRows = changes.groupBy("key").count().where(col("count") < threshold)
      .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
    assert(compacted.count() === coldRows + hotN)
    // resolves identically to the raw log
    val before = ResolveEngine.resolve(changes).collect()
      .map(d => d.id -> (d.body, d.version, d.signature)).toMap
    val after = ResolveEngine.resolve(compacted).collect()
      .map(d => d.id -> (d.body, d.version, d.signature)).toMap
    assert(after === before)

    // differential stash export: only docs mutated after the horizon
    val docs = ResolveEngine.resolve(changes)
    val horizon = docs.toDF().agg(expr("percentile_approx(last_update_ms, 0.5)"))
      .collect()(0).getLong(0)
    val root = java.nio.file.Files.createTempDirectory("stash_delta").toString
    val out = Stash.exportDelta(docs, root, "delta-1", sinceMs = horizon)
    val back = Stash.read(spark, out, Some("events"))
    val expected = docs.filter(d => d.last_update_ms > horizon && !d.deleted).count()
    assert(back.count() === expected && expected > 0 && expected < docs.count())
  }

  test("PROPERTY: compiled row conditions match the reference evaluator model") {
    import graft.condition.{ConditionEvaluator, Conditions}
    import graft.json._
    val orders = Tables.read(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val conds = Seq(
      """{..,"o_orderstatus":"O"}""",
      """{..,"o_totalprice":gt(100000)}""",
      """{..,"o_orderstatus":in("O","F"),"o_orderpriority":like("1*")}""",
      """not({..,"o_orderstatus":"O"})""",
      """or({..,"o_totalprice":le(50000)},{..,"o_orderpriority":like("*URGENT*")})""",
      """{..,"o_orderstatus":is(string)}""",
      """{..,"nope":is(undefined)}""",
      """not({..,"nope":+})""",
      """and(not({..,"o_orderstatus":like("O*")}),{..,"o_totalprice":is(num)})""",
      """{..,"o_orderkey":ge(500)}""",
      """not(or({..,"o_orderstatus":"F"},not({..,"o_totalprice":gt(0)})))""")
    // driver-side reference model: evaluate every condition over the rows
    // as JSON objects with the exact evaluator semantics
    val rows = orders.collect().map { r =>
      r.getLong(0) -> JValue.obj(
        "o_orderkey" -> JLong(r.getLong(0)),
        "o_orderstatus" -> JString(r.getString(1)),
        "o_totalprice" -> JDouble(r.getDouble(2)),
        "o_orderpriority" -> JString(r.getString(3)))
    }
    conds.foreach { text =>
      val cond = Conditions.fromString(text)
      val expected = rows.filter { case (_, json) =>
        ConditionEvaluator.eval(cond, json) }.map(_._1).toSet
      val got = orders.where(ConditionCompiler.compileRow(cond, orders))
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"condition: $text")
    }
  }

  test("PROPERTY: document where-conditions match the evaluator over body+intrinsics") {
    import graft.condition.{ConditionEvaluator, Conditions}
    import graft.json._
    val docs = ResolveEngine.resolve(EventLog.changes(spark, "/root/testdata/sf0.001"))
    val conds = Seq(
      """{..,"last_type":in("purchase","signup"),"last_value":gt(0)}""",
      """not({..,"last_type":"error"})""",
      """and(intrinsic("~table":"events"),{..,"k":is(num)})""",
      """or(intrinsic("~id":like("1*")),{..,"last_value":le(0.5)})""",
      """{..,"missing_field":is(undefined)}""",
      """not(and({..,"last_type":like("p*")},intrinsic("~deleted":false)))""",
      """partition(4:1,2)""",
      """and(partition(2:1),{..,"last_type":+})""")
    val collected = docs.collect()
    conds.foreach { text =>
      val cond = Conditions.fromString(text)
      val expected = collected.filter { d =>
        ConditionEvaluator.eval(cond,
          JsonCodec.parseOrUndefined(d.body), EmoDocs.intrinsicsOf(d))
      }.map(_.id).toSet
      val got = EmoDocs.where(docs, text).collect().map(_.id).toSet
      assert(got === expected, s"condition: $text")
    }
  }

  test("resolveWhere pushes coordinate conjuncts below the fold") {
    val changes = EventLog.placementChanges(spark, "/root/testdata/sf0.001")
    val conds = Seq(
      """and(intrinsic("~table":"orders"),{..,"status":"O"})""",
      """and(partition(4:1),intrinsic("~id":like("1*")))""",
      """and(not(intrinsic("~table":"orders")),{..,"last_value":gt(0)})""",
      """or(intrinsic("~id":"3"),intrinsic("~id":"5"))""")
    conds.foreach { text =>
      val pushed = EmoDocs.resolveWhere(changes, text).collect()
        .map(d => d.table -> d.id).toSet
      val unpushed = EmoDocs.where(ResolveEngine.resolve(changes), text).collect()
        .map(d => d.table -> d.id).toSet
      assert(pushed === unpushed, s"condition: $text")
      assert(pushed.nonEmpty, s"vacuous fixture: $text")
    }
  }

  test("plan contracts: pushdown, pruning and broadcast survive in key queries") {
    val dir = "/root/testdata/sf0.001"
    def planOf(name: String): String =
      graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // compiled equality reaches the parquet scan as a pushed filter
    val condPlan = planOf("cond_equal")
    assert(condPlan.contains("PushedFilters") && condPlan.contains("EqualTo(p_size,5)"),
      s"cond_equal lost pushdown:\n$condPlan")
    // the scan is column-pruned to what the query projects
    assert(condPlan.contains("struct<p_partkey:bigint,p_size:int>"))
    // the dim side of the enrichment join broadcasts
    val joinPlan = planOf("join_enrich")
    assert(joinPlan.contains("BroadcastHashJoin"), s"join_enrich not broadcast:\n$joinPlan")
    // glob conditions push as string-prefix filters
    val likePlan = planOf("cond_like")
    assert(likePlan.contains("PushedFilters") &&
      (likePlan.contains("StringStartsWith") || likePlan.contains("StringContains")),
      s"cond_like lost string pushdown:\n$likePlan")
  }

  test("plan contracts: new-operator physical shapes") {
    val s = spark
    import s.implicits._
    // claim is ONE shuffle (the subscription/lapsed window), no union split
    // re-reading the channel
    val channel = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L))
      .toDF("subscription", "msg_id", "claim_until_ms")
    // (string match: AQE wraps the plan, hiding the tree from collect)
    val claimPlan = graft.streaming.Claims.claim(channel, 1000L, 500L, 10)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(claimPlan).size === 1,
      s"claim should shuffle once:\n$claimPlan")
    assert(!claimPlan.contains("Union"),
      s"claim re-introduced the filter/union split:\n$claimPlan")
    // the bucketed embedding-dedup path never materializes an all-pairs
    // join: candidates come from equi-joins only
    val emb = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val bucketedPlan = graft.pipeline.Similarity.embeddingNearDuplicates(
        emb, "vec_id", "embedding", threshold = 0.99, preBucket = Some(true))
      .queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("BroadcastNestedLoopJoin") &&
      !bucketedPlan.contains("CartesianProduct"),
      s"bucketed embedding dedup fell back to all-pairs:\n$bucketedPlan")
  }

  test("deterministic sampling: stable subsets, disjoint splits, strata fractions") {
    import graft.pipeline.Sampling
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    // rerun-stable and nested: a 20% sample is a subset of the 50% sample
    val s20 = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s50))
    assert(math.abs(s20.size.toDouble / n - 0.2) < 0.1)
    assert(math.abs(s50.size.toDouble / n - 0.5) < 0.1)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() === n)
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() === 0)
    // split is disjoint and exhaustive
    val (train, eval) = Sampling.trainEvalSplit(docs, "doc_id", 0.8)
    assert(train.count() + eval.count() === n)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val evalIds = eval.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(evalIds).isEmpty)
    // stratified: per-language fractions honored (and only listed strata kept)
    val withLang = docs.withColumn("lang",
      graft.pipeline.TextAnalysis.langId(col("text")))
    val langs = withLang.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strat = Sampling.stratifiedSample(withLang, "doc_id", "lang",
      Map("en" -> 1.0, "und" -> 0.5))
    val got = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(Set("en", "und")))
    assert(got.getOrElse("en", 0L) === langs.getOrElse("en", 0L))
  }

  test("table catalog: create/template/drop fold; lookups and placements") {
    import graft.engine.TableCatalog
    val log = Seq(
      TableCatalog.createTable("a:1", "p1:x", """{"k":1}""", 1000L),
      TableCatalog.createTable("b:1", "p2:y", """{"k":2}""", 2000L),
      TableCatalog.setTemplate("a:1", """{"k":9}""", 3000L),
      TableCatalog.dropTable("b:1", 4000L))
    val cat = TableCatalog.catalog(spark, log)
    assert(TableCatalog.tableExists(cat, "a:1"))
    assert(!TableCatalog.tableExists(cat, "b:1"))
    assert(!TableCatalog.tableExists(cat, "nope"))
    assert(TableCatalog.getTemplate(cat, "a:1") === Some("""{"k":9}"""))
    assert(TableCatalog.getTemplate(cat, "b:1") === None)
    assert(TableCatalog.placements(cat) === Seq("p1:x"))
    // re-creating a dropped table resumes its version chain (full history)
    val cat2 = TableCatalog.catalog(spark,
      log :+ TableCatalog.createTable("b:1", "p2:y", """{"k":3}""", 5000L))
    assert(TableCatalog.tableExists(cat2, "b:1"))
    assert(TableCatalog.getTemplate(cat2, "b:1") === Some("""{"k":3}"""))
  }

  test("table catalog: metadata splicing is escaped and validated") {
    import graft.engine.TableCatalog
    // a placement containing quotes/backslashes must round-trip intact
    val tricky = """p"quo\te"""
    val log = Seq(TableCatalog.createTable("q:1", tricky, """{"k":"v w"}""", 1000L))
    val cat = TableCatalog.catalog(spark, log)
    assert(TableCatalog.tableExists(cat, "q:1"))
    assert(TableCatalog.placements(cat) === Seq(tricky))
    // malformed template JSON fails at construction, not at resolve time
    intercept[IllegalArgumentException] {
      TableCatalog.createTable("bad", "p", """{not json""", 1L)
    }
    intercept[IllegalArgumentException] {
      TableCatalog.setTemplate("bad", """{"unclosed":""", 2L)
    }
  }

  test("queue poll/claim and dedup queue") {
    import graft.streaming.Queues
    val s = spark
    import s.implicits._
    val q = Seq((1L, "a", "m1"), (2L, "b", "m2"), (3L, "a", "m3"), (4L, "c", "m4"), (5L, "b", "m5"))
      .toDF("msg_id", "dedup_key", "payload")
    val batch1 = Queues.poll(q, 0L, 2).collect().map(_.getLong(0))
    assert(batch1.toSeq === Seq(1L, 2L))
    val batch2 = Queues.poll(q, batch1.max, 2).collect().map(_.getLong(0))
    assert(batch2.toSeq === Seq(3L, 4L)) // claim watermark acks batch 1
    val dedupRows = Queues.dedup(q, "dedup_key")
      .select("msg_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // first message per key, WITH its payload (the survivors are full
    // queue rows, not bare (key, msg_id) pairs)
    assert(dedupRows.toSeq === Seq((1L, "m1"), (2L, "m2"), (4L, "m4")))
    assert(Queues.sizeEstimate(q, 3) === ((3L, false)))
    assert(Queues.sizeEstimate(q, 10) === ((5L, true)))
    // a limit past Int range must not overflow the probe-row .toInt —
    // it clamps to an exact count instead
    assert(Queues.sizeEstimate(q, Long.MaxValue) === ((5L, true)))
    assertThrows[IllegalArgumentException](Queues.sizeEstimate(q, -1))
  }

  test("intrinsic timestamps render UTC under ANY session timezone") {
    val s = spark
    import s.implicits._
    val prior = s.conf.get("spark.sql.session.timeZone")
    try {
      // date_format(timestamp) renders in SESSION time — a non-UTC session
      // must not shift the intrinsic ISO strings away from the Iso8601(UTC)
      // parity path (timestamp conditions would silently disagree)
      s.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ms = 1755222330123L // 2025-08-15T01:45:30.123Z
      val df = Seq(("t", "id1", "sig", false, ms, ms, ms, "p"))
        .toDF("table", "id", "signature", "deleted", "first_update_ms",
          "last_update_ms", "last_mutate_ms", "placement")
      val iso = df.select(EmoDocs.intrinsicColumns(df)(
        graft.condition.Intrinsic.FirstUpdateAt).as("x")).head().getString(0)
      assert(iso === graft.resolve.Iso8601.format(ms))
      // and the native predicate path agrees with the parity evaluator
      val kept = df.where(EmoDocs.predicate(df,
        s"""intrinsic("~firstUpdateAt":ge("${graft.resolve.Iso8601.format(ms)}"))"""))
      assert(kept.count() === 1L)
    } finally s.conf.set("spark.sql.session.timeZone", prior)
  }

  test("stash export/read round-trips resolved docs with intrinsics") {
    val docs = ResolveEngine.resolve(EventLog.changes(spark, "/root/testdata/sf0.001"))
    val root = java.nio.file.Files.createTempDirectory("stash_test").toString
    val out = Stash.export(docs, root, "2026-01-01")
    assert(Stash.latest(spark, root) === out)
    assert(Stash.listTables(spark, out) === Seq("events"))
    val back = Stash.read(spark, out, Some("events"))
    assert(back.count() === docs.count())
    val row = back.where(col("~id") === "3").select("~version", "~table").collect()(0)
    assert(row.getLong(0) > 0 && row.getString(1) === "events")
    // splits = the table's files; their union re-covers the table exactly
    val splits = Stash.getSplits(spark, out, "events")
    assert(splits.nonEmpty)
    val splitTotal = splits.map(p => Stash.readSplit(spark, p).count()).sum
    assert(splitTotal === docs.count())
    val (tbl, nSplits, bytes) = Stash.tableMetadata(spark, out, "events")
    assert(tbl === "events" && nSplits === splits.size && bytes > 0)
  }

  test("table move lifecycle: mirror writes, promote, complete, cancel (TableLifeCycleTest parity)") {
    import graft.engine.{TableCatalog, TableMove}
    def route(log: Seq[graft.resolve.ChangeRow]): (String, Seq[String], String) = {
      val r = TableMove.routing(spark, log).where(col("tbl") === "my:table")
        .select("read_placement", "write_placements", "move_state").collect()(0)
      (r.getString(0), r.getSeq[String](1), Option(r.getString(2)).orNull)
    }
    val created = Seq(TableCatalog.createTable("my:table", "ugc_us", "{}", 1000L))
    assert(route(created) === (("ugc_us", Seq("ugc_us"), null)))

    // moveStart: reads stay on source, writes mirror to both (testMoveStart)
    val started = created :+ TableMove.moveStart("my:table", "ugc_global", 2000L)
    assert(route(started) === (("ugc_us", Seq("ugc_global", "ugc_us"), "mirror_activated")))

    // the copy step is the resolved snapshot of just that table
    val docs = ResolveEngine.resolve(EventLog.changes(spark, "/root/testdata/sf0.001")).toDF()
    assert(TableMove.copySnapshot(docs, "events").count() === docs.where(col("table") === "events").count())

    // promote: placement swaps, source demotes but still receives writes
    // (testMoveCopyPromoteDrop mid-state)
    val promoted = started :+ TableMove.movePromote("my:table", "ugc_us", "ugc_global", 3000L)
    assert(route(promoted) === (("ugc_global", Seq("ugc_global", "ugc_us"), "demoted")))

    // complete: source mirror dropped
    val completed = promoted :+ TableMove.moveComplete("my:table", 4000L)
    assert(route(completed) === (("ugc_global", Seq("ugc_global"), null)))

    // cancel before promote: destination mirror dropped, all traffic on source
    val canceled = started :+ TableMove.moveCancel("my:table", 3000L)
    assert(route(canceled) === (("ugc_us", Seq("ugc_us"), null)))

    // drops and promotes are the UNPUBLISHED databus events, window-filtered
    // (testListUnpublishedDatabusEvents)
    val log = promoted :+ TableCatalog.dropTable("gone:table", 3500L)
    val events = TableMove.listUnpublishedDatabusEvents(spark, log, 2500L, 4000L)
      .orderBy("event_ms").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(events.toSeq === Seq((3000L, "my:table", "promote"), (3500L, "gone:table", "drop")))
    assert(TableMove.listUnpublishedDatabusEvents(spark, log, 0L, 2500L).count() === 0)
  }

  test("stash: ':' table encoding, _SUCCESS payload, locked reader (StashReaderTest parity)") {
    import org.apache.spark.sql.functions.lit
    // a table whose name needs path encoding (':' -> '~', StashUtil.java)
    val docs = ResolveEngine.resolve(
        EventLog.changes(spark, "/root/testdata/sf0.001"))
      .withColumn("table", lit("review:testcustomer"))
      .as[graft.resolve.DocRow](org.apache.spark.sql.Encoders.product[graft.resolve.DocRow])
    val root = java.nio.file.Files.createTempDirectory("stash_enc").toString
    val scan1 = "2015-01-01-00-00-00"
    val out = Stash.export(docs, root, scan1)
    // directory on disk is the ENCODED form; the API round-trips real names
    assert(new java.io.File(s"$out/table=review~testcustomer").isDirectory)
    assert(Stash.listTables(spark, out) === Seq("review:testcustomer"))
    assert(Stash.read(spark, out, Some("review:testcustomer")).count() === docs.count())
    assert(Stash.getSplits(spark, out, "review:testcustomer").nonEmpty)
    // _SUCCESS carries start/complete/scanId; creation time parses from line 1
    assert(!Stash.stashCreationTime(out)
      .isAfter(java.time.Instant.now()))
    // timestamp-format scan ids encode their creation time
    assert(Stash.creationTimeFromScanId(scan1) ===
      java.time.Instant.parse("2015-01-01T00:00:00Z"))
    assert(Stash.scanIdForCreationTime(java.time.Instant.parse("2015-01-02T00:00:00Z"))
      === "2015-01-02-00-00-00")
    // locked reader pins the snapshot while a new export lands
    val reader = new StashReader(spark, root)
    assert(reader.getLatest === scan1)
    assert(reader.getLatestCreationTime === java.time.Instant.parse("2015-01-01T00:00:00Z"))
    reader.lockToLatest()
    Stash.export(docs, root, "2015-01-02-00-00-00")
    assert(reader.getLatest === scan1, "locked reader still sees the pinned export")
    assert(reader.listTables() === Seq("review:testcustomer"))
    reader.unlock()
    assert(reader.getLatest === "2015-01-02-00-00-00")
    assert(reader.getLatestCreationTime === java.time.Instant.parse("2015-01-02T00:00:00Z"))
  }

  test("as-of snapshot: cutoff excludes later deltas from resolve and stash export") {
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    // pick a cutoff between the min and max change times
    val bounds = changes.agg(min(col("ms")), max(col("ms"))).collect()(0)
    val cutoff = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val snap = ResolveEngine.resolveAsOf(changes, cutoff).collect()
    assert(snap.nonEmpty)
    // every resolved doc's last update is at or before the cutoff, and the
    // snapshot equals resolving the manually-filtered log
    assert(snap.forall(_.last_update_ms <= cutoff))
    val manual = ResolveEngine.resolve(changes.where(col("ms") <= cutoff)).collect()
      .map(d => d.id -> (d.body, d.version, d.signature)).toMap
    assert(snap.map(d => d.id -> (d.body, d.version, d.signature)).toMap === manual)
    // versions strictly below the live resolve for docs that kept updating
    val live = ResolveEngine.resolve(changes).collect().map(d => d.id -> d.version).toMap
    assert(snap.forall(d => d.version <= live(d.id)))
    assert(snap.exists(d => d.version < live(d.id)))

    // stash consistency window: the as-of export serves the snapshot
    val root = java.nio.file.Files.createTempDirectory("stash_asof").toString
    val out = Stash.exportAsOf(changes, root, "snap-1", cutoff)
    val back = Stash.read(spark, out, Some("events"))
    val exported = back.select(col("~id"), col("~version")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = snap.filter(!_.deleted).map(d => d.id -> d.version).toMap
    assert(exported === expected)
  }

  test("session scan pagination is resumable and ordered by row key") {
    val session = new EmoSession(spark, EventLog.changes(spark, "/root/testdata/sf0.001"))
    val page1 = session.scan("events", limit = 5).select("row_key").collect().map(_.getString(0))
    assert(page1.length === 5 && page1.sorted.toSeq === page1.toSeq)
    val page2 = session.scan("events", fromRowKeyExclusive = Some(page1.last), limit = 5)
      .select("row_key").collect().map(_.getString(0))
    assert(page2.length === 5)
    assert(page2.head > page1.last)
    assert((page1 ++ page2).distinct.length === 10)
  }

  test("json accessors preserve undefined-vs-null; blob ranged reads") {
    val s = spark
    import s.implicits._
    import graft.engine.expressions._
    val df = Seq("""{"a":null,"b":{"c":5},"d":[1,2]}""").toDF("body")
    val row = df.select(
      emoJsonType($"body", "a"), emoJsonType($"body", "missing"),
      emoJsonType($"body", "b.c"), emoJsonType($"body", "b.x"),
      emoJsonType($"body", "d"), emoJsonGet($"body", "b"),
      emoJsonGet($"body", "missing")).collect()(0)
    assert(row.getString(0) === "null")
    assert(row.getString(1) === "undefined")
    assert(row.getString(2) === "num")
    assert(row.getString(3) === "undefined")
    assert(row.getString(4) === "array")
    assert(row.getString(5) === """{"c":5}""")
    assert(row.isNullAt(6))

    // blobs: metadata scan + ranged get over real files
    import graft.engine.Blobs
    val dir = java.nio.file.Files.createTempDirectory("blobs").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b1.bin"),
      "hello world blob one".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b2.bin"),
      "second blob".getBytes)
    val meta = Blobs.scanMetadata(spark, dir).collect()
    assert(meta.length === 2 && meta.map(_.getAs[Long]("length")).sum === 31)
    val ranged = Blobs.ranged(Blobs.read(spark, dir, "b1.bin"), 6, 5).collect()(0)
    assert(new String(ranged.getAs[Array[Byte]]("range")) === "world")
  }

  test("replay and canary") {
    import graft.streaming.{Databus, Subscription}
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val total = changes.count()
    val canary = Databus.canary(changes).collect()(0)
    assert(canary.getAs[Long]("events_seen") === total)
    val horizon = 1705000000000L
    val replayed = Databus.replay(changes,
      Seq(Subscription("all", "alwaysTrue()")), sinceMs = horizon)
    assert(replayed.count() === changes.where(col("ms") >= horizon).count())
    assert(replayed.count() < total)
  }

  test("delta stream parsing") {
    import graft.delta.Deltas
    val deltas = Deltas.parseStream("""{..,"a":1} ~ .. {"b":2} if + then ~ end""").toSeq
    assert(deltas.size === 5)
    assert(deltas(1) === graft.delta.DeleteDelta)
    assert(deltas(2) === graft.delta.NoopDelta)
  }

  test("timeline bounds and reversal") {
    val session = new EmoSession(spark, EventLog.changes(spark, "/root/testdata/sf0.001"))
    val fwd = session.timeline("events", "3").select("seq").collect().map(_.getLong(0))
    val rev = session.timeline("events", "3", reversed = true).select("seq").collect().map(_.getLong(0))
    assert(fwd.toSeq === rev.reverse.toSeq)
    assert(fwd.sorted.toSeq === fwd.toSeq)
    val bounded = session.timeline("events", "3",
      startMs = Some(fwd.length.toLong), limit = 3).collect()
    assert(bounded.length <= 3)

    // over a compacted log, the checkpoint surfaces as a compaction record
    // with a readable delta (reserved marker stripped)
    val compacted = graft.resolve.Compactor.compact(
      EventLog.changes(spark, "/root/testdata/sf0.001"), cutoffMs = Long.MaxValue)
    val tl = new EmoSession(spark, compacted).timeline("events", "3").collect()
    assert(tl.length === 1)
    val row = tl.head
    assert(row.getAs[String]("change_type") === "compaction")
    assert(row.getAs[String]("delta").startsWith("{")) // readable JSON literal
  }

  test("reads never miss: non-existent record sentinel (DataStoreTest multiGet parity)") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      graft.resolve.ChangeRow("t", "real", 1000L, 0L, "n", """{"x":1}""", Seq.empty),
      graft.resolve.ChangeRow("t", "gone", 1000L, 0L, "n", """{"y":2}""", Seq.empty),
      graft.resolve.ChangeRow("t", "gone", 2000L, 0L, "n", "~", Seq.empty)).toDF()
    val session = new EmoSession(spark, changes)
    // unknown coordinate -> synthetic record: deleted, version 0, zero signature
    val fake = session.getOrDefault("t", "never_written")
    assert(fake.deleted && fake.version === 0L &&
      fake.signature === EmoSession.NonExistentSignature && fake.body == null)
    // multiGetAll: one row per requested coordinate; the real delete keeps
    // its true version/signature (distinct from the never-written sentinel)
    val rows = session.multiGetAll(Seq(("t", "real"), ("t", "gone"), ("t", "nope")))
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Boolean]("deleted"), r.getAs[Long]("version"), r.getAs[String]("signature"))))
      .toMap
    assert(rows.keySet === Set("real", "gone", "nope"))
    assert(!rows("real")._1 && rows("real")._2 === 1L)
    assert(rows("gone")._1 && rows("gone")._2 === 2L &&
      rows("gone")._3 != EmoSession.NonExistentSignature)
    assert(rows("nope") === ((true, 0L, EmoSession.NonExistentSignature)))
  }

  test("compactWithHistory: archived prefix, oversized docs discarded, TTL stamped") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      graft.resolve.ChangeRow("t", "small", 1000L, 0L, "n", """{"x":1}""", Seq.empty),
      graft.resolve.ChangeRow("t", "small", 2000L, 0L, "n", """{..,"x":2}""", Seq.empty),
      graft.resolve.ChangeRow("t", "small", 9000L, 0L, "n", """{..,"x":3}""", Seq.empty),
      graft.resolve.ChangeRow("t", "big", 1000L, 0L, "n",
        s"""{"blob":"${"a" * 500}"}""", Seq.empty)).toDF()
    val (compacted, history) = graft.resolve.Compactor.compactWithHistory(
      changes, cutoffMs = 5000L, historyTtlMs = 60000L, nowMs = 100000L,
      maxArchiveBytes = 100L)
    // semantics unchanged by the compaction itself
    val before = graft.resolve.ResolveEngine.resolve(changes).collect()
      .map(d => (d.table, d.id, d.version, d.signature, d.body)).toSet
    val after = graft.resolve.ResolveEngine.resolve(compacted).collect()
      .map(d => (d.table, d.id, d.version, d.signature, d.body)).toSet
    assert(after === before)
    // small doc: both pre-cutoff deltas archived with the expiry stamped;
    // big doc: archive exceeds the cap, history discarded wholesale
    val h = history.select("key", "ms", "expire_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(h.toSet === Set(("small", 1000L, 160000L), ("small", 2000L, 160000L)))
  }

  test("timelineResolved: per-version states end at the batch fold, incl. compacted") {
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val session = new EmoSession(spark, changes)
    val versions = session.timelineResolved("events", "3").collect()
    // versions run 1..n in changeId order
    assert(versions.map(_.getAs[Long]("version")).toSeq === (1L to versions.length).toSeq)
    // the last per-version state IS the batch-resolved document (signature too)
    val doc = session.get("events", "3").get
    val last = versions.last
    assert(last.getAs[Long]("version") === doc.version)
    assert(last.getAs[String]("signature") === doc.signature)
    assert(last.getAs[String]("body") === doc.body)
    // over a compacted log: one compaction record restoring the same state
    val compacted = graft.resolve.Compactor.compact(changes, cutoffMs = Long.MaxValue)
    val cv = new EmoSession(spark, compacted).timelineResolved("events", "3").collect()
    assert(cv.length === 1)
    assert(cv.head.getAs[String]("change_type") === "compaction")
    assert(cv.head.getAs[Long]("version") === doc.version)
    assert(cv.head.getAs[String]("signature") === doc.signature)
    assert(cv.head.getAs[String]("body") === doc.body)
  }

  test("weak vs strong reads: WEAK serves the stale view, STRONG folds the live log") {
    import graft.delta.{Deltas, DslParser}
    import graft.json.{JObj, JString}
    val s0 = new EmoSession(spark, changesDf(Seq.empty))
    val r1 = s0.update("t", "k", Deltas.literal(
      JObj(Map("v" -> JString("old")))), atMs = 1000L)
    // materialize the resolved view at this point, then write again
    val view = r1.session.docs.toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    view.count()
    val r2 = r1.session.update("t", "k",
      DslParser.parseDelta("""{..,"v":"new"}"""), atMs = 2000L)
    val lagged = new EmoSession(spark, r2.session.changes,
      resolvedView = Some(view))
    // STRONG sees the acknowledged write; WEAK serves the stale view
    assert(lagged.get("t", "k").get.body.contains("\"v\":\"new\""))
    assert(lagged.get("t", "k", consistency = EmoSession.Weak).get
      .body.contains("\"v\":\"old\""))
    // WEAK with no view maintained degrades to STRONG, not a failure
    assert(new EmoSession(spark, r2.session.changes)
      .get("t", "k", consistency = EmoSession.Weak).get
      .body.contains("\"v\":\"new\""))
    // the WEAK batch path plans no fold: broadcast semi-join on the view,
    // no shuffle exchange anywhere
    val weakExec = lagged.multiGet(Seq(("t", "k")),
      consistency = EmoSession.Weak).queryExecution.executedPlan
    val weakPlan = weakExec.toString
    assert(weakPlan.contains("BroadcastHashJoin") ||
      weakPlan.contains("BroadcastNestedLoopJoin"))
    // collect the node type, not a name substring: ShuffleExchangeExec
    // prints as plain "Exchange", so a string match can never fail
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val weakShuffles = weakExec.collect { case e: ShuffleExchangeExec => e }
    assert(weakShuffles.isEmpty,
      s"weak multiGet shuffled:\n$weakPlan")
    view.unpersist()
  }

  test("updateAll round-trip: write -> resolve -> databus event visible (DataStoreTest.testUpdate)") {
    import graft.delta.{Deltas, DslParser}
    import graft.json.{JLong, JObj, JString}
    val empty = changesDf(Seq.empty)
    val s0 = new EmoSession(spark, empty)

    // write: sanitize strips intrinsics/~tags from the top-level literal
    val body = JObj(Map("name" -> JString("Bob"), "rating" -> JLong(5),
      "~id" -> JString("spoofed"), "~tags" -> JString("spoofed")))
    val r1 = s0.update("review:testcustomer", "k1", Deltas.literal(body),
      atMs = 1000L, tags = Set("re"), audit = Some("""{"program":"test"}"""))
    // the databus ref precedes the store write and carries the changeId + tags
    val ref = r1.refs.collect()
    assert(ref.length === 1)
    assert(ref.head.getAs[String]("table") === "review:testcustomer")
    assert(ref.head.getAs[Long]("ms") === 1000L)
    assert(ref.head.getAs[Seq[String]]("tags") === Seq("re"))
    // resolve: the written doc comes back, intrinsics stripped, version 1
    val doc1 = r1.session.get("review:testcustomer", "k1").get
    assert(doc1.version === 1L)
    assert(doc1.body.contains("\"name\":\"Bob\"") && !doc1.body.contains("spoofed"))

    // second write via a parsed delta; seq assignment keeps changeIds ordered
    val r2 = r1.session.update("review:testcustomer", "k1",
      DslParser.parseDelta("""{..,"rating":4}"""), atMs = 2000L)
    val doc2 = r2.session.get("review:testcustomer", "k1").get
    assert(doc2.version === 2L && doc2.body.contains("\"rating\":4"))

    // the refs drive fanout like any event batch
    val matched = Databus.fanout(r1.refs,
      Seq(Subscription("all", """{..,"~tags":contains("re")}""")))
    assert(matched.count() === 1)

    // delete tombstones through the same path; read honors includeDeleted
    val r3 = r2.session.delete("review:testcustomer", "k1", atMs = 3000L)
    assert(r3.session.get("review:testcustomer", "k1").isEmpty)
    val tomb = r3.session.get("review:testcustomer", "k1", includeDeleted = true).get
    assert(tomb.deleted && tomb.version === 3L)

    // guard rails: far-past changeId, illegal table name, oversized tags,
    // non-object top-level literal
    intercept[IllegalArgumentException] {
      r3.session.updateAll(Seq(EmoSession.Update("t", "k", Deltas.noop)),
        atMs = 10L, fullConsistencyMs = 100L)
    }
    intercept[IllegalArgumentException] {
      s0.update("_Illegal Name", "k", Deltas.noop, atMs = 1L)
    }
    intercept[IllegalArgumentException] {
      s0.update("t", "k", Deltas.noop, atMs = 1L, tags = Set("waytoolongtag"))
    }
    intercept[IllegalArgumentException] {
      s0.update("t", "k", Deltas.literal(JString("scalar")), atMs = 1L)
    }
  }

  test("blob putAll writes every object readable through the blob scan") {
    val s = spark
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_blob_put_spec_${System.nanoTime()}"
    val docs = (1 to 37).map(i => (i.toLong, s"payload-$i-héllo\n" * i))
      .toDF("doc_id", "text").repartition(4)
    Blobs.putAll(docs, "doc_id", "text", dir)
    val back = Blobs.read(s, dir, "*.txt")
      .select(regexp_extract(col("path"), "([0-9]+)\\.txt$", 1).cast("long").as("doc_id"),
        decode(col("content"), "UTF-8").as("text"))
      .as[(Long, String)].collect().toMap
    assert(back.size === 37)
    for (i <- 1 to 37) assert(back(i.toLong) === s"payload-$i-héllo\n" * i)
    // overwrite put: a second putAll with different payloads fully replaces
    val docs2 = (1 to 37).map(i => (i.toLong, s"v2-$i")).toDF("doc_id", "text")
    Blobs.putAll(docs2, "doc_id", "text", dir)
    val back2 = Blobs.read(s, dir, "*.txt")
      .select(regexp_extract(col("path"), "([0-9]+)\\.txt$", 1).cast("long").as("doc_id"),
        decode(col("content"), "UTF-8").as("text"))
      .as[(Long, String)].collect().toMap
    assert(back2.size === 37 && back2(5L) === "v2-5")
  }
}
