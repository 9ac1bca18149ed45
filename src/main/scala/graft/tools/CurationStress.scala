package graft.tools

import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev tool: stress the round-5 curation operators at a multiple of sf0.1
 * (docs replicated with distinct ids to multi-file parquet, modeling a real
 * table scan) to sanity-check the scale story: decontamination stays a
 * broadcast semi-join, repetition stats stay one scan, packing's prefix sum
 * stays two narrow passes, heap top-k moves no corpus data, semantic dedup
 * stays within-cluster. Prints rows/sec per operator.
 */
object CurationStress {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    val docs0 = graft.engine.Tables.read(spark, sf, "documents")
      .select("doc_id", "text")
    val reps = spark.range(mult).withColumnRenamed("id", "rep")
    val docsTmp = System.getProperty("java.io.tmpdir") + "/curation_stress_docs"
    docs0.crossJoin(reps)
      .select((col("doc_id") * mult + col("rep")).as("doc_id"), col("text"))
      .repartition(64).write.mode("overwrite").parquet(docsTmp)
    val docs = spark.read.parquet(docsTmp)
    val nDocs = docs.count()

    val emb0 = graft.engine.Tables.read(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val embTmp = System.getProperty("java.io.tmpdir") + "/curation_stress_emb"
    emb0.crossJoin(reps)
      .select((col("vec_id") * mult + col("rep")).as("vec_id"), col("embedding"))
      .repartition(64).write.mode("overwrite").parquet(embTmp)
    val emb = spark.read.parquet(embTmp)
    val nVecs = emb.count()

    def time(name: String, rows: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CURATION_STRESS $name%-14s rows=$rows out=$out secs=$secs%.1f rows_per_sec=${rows / secs}%.0f")
    }

    val evalSet = docs0.where(col("doc_id") < 20).select(col("text"))
    time("decon", nDocs) {
      Decontaminate.contaminatedIds(docs, "doc_id", "text", evalSet, "text", n = 5).count()
    }
    time("repetition", nDocs) {
      docs.select(TextAnalysis.repetitionStats(col("text")).as("st"))
        .agg(sum(col("st.n_dup_segs"))).collect()
      nDocs
    }
    time("gates", nDocs) {
      docs.where(TextAnalysis.qualityOk(col("text")) &&
        TextAnalysis.repetitionOk(col("text"))).count()
    }
    val tok = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    time("pack", nDocs) {
      Packing.sequenceStats(tok, "doc_id", "n_tokens", budget = 2048L).count()
    }
    time("budget_carve", nDocs) {
      Packing.tokenBudgetSample(tok, "doc_id", "n_tokens", budget = 1000000L).count()
    }
    time("pii_clean", nDocs) {
      docs.select(md5(TextClean.scrub(col("text"))).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    // boilerplate strip: per-segment probe cost must be INDEPENDENT of
    // |boiler| (hash-set membership) — the capped 100k-entry list and a
    // 100-entry list should run at the same docs/s; the old plan-literal
    // array_contains was O(|boiler|) compares per segment, three orders
    // of magnitude apart on this pair
    val boiler100 = (1 to 100).map(i => s"boilerplate sentinel $i")
    val boiler100k = (1 to 100000).map(i => s"boilerplate sentinel $i")
    time("boiler_100", nDocs) {
      docs.select(md5(TextClean.stripSegments(col("text"), boiler100)).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    time("boiler_100k", nDocs) {
      docs.select(md5(TextClean.stripSegments(col("text"), boiler100k)).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    // blocklist gate (O(1) probe per token) and mojibake repair (charset
    // probe per row) — both scan-local single-pass expressions
    time("blocklist", nDocs) {
      val words = (1 to 10000).map(i => s"blocked$i") ++ Seq("scan", "merge")
      docs.select(textExpressions.blocklistStats(col("text"), words).as("st"))
        .agg(sum(col("st.n_blocked"))).collect()
      nDocs
    }
    time("mojibake", nDocs) {
      docs.select(md5(textExpressions.fixMojibake(col("text"))).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    // NOTE: actions must consume computed columns — a bare count() lets
    // Catalyst eliminate unique-keyed outer joins and prune projections,
    // timing nothing but the scan
    time("span_stats", nDocs) {
      Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 10)
        .agg(sum(col("n_dup_spans"))).collect()(0).getLong(0)
    }
    time("lm_vocab", nDocs) {
      val vocab = LmScore.vocabulary(docs, "text", topV = 100)
        .collect().map(_.getString(0)).toSeq
      LmScore.vocabCounts(docs, "doc_id", "text", vocab)
        .agg(sum(col("n_oov"))).collect()(0).getLong(0)
    }
    // vocab-coverage cost must be FLAT in |vocab| (O(1) hash probe per
    // token): the 100k-entry set and the 100-entry set above should run at
    // the same docs/s — the old literal-array array_contains was
    // O(|vocab|) compares per token, three orders of magnitude apart here
    time("lm_vocab_100k", nDocs) {
      val vocab100k = (1 to 100000).map(i => s"vocabword$i")
      LmScore.vocabCounts(docs, "doc_id", "text", vocab100k)
        .agg(sum(col("n_oov"))).collect()(0).getLong(0)
    }
    // trackDrops audit: the eager (id, stage) localCheckpoint must be
    // sized by TOTAL DROP COUNT, never the corpus — pinned by running the
    // SAME corpus and the SAME stage structure (one language gate) with a
    // pass-everything language set vs a drop-everything one: both runs
    // pay the fixed per-stage anti-diff over cached ids, but the
    // checkpointed audit of the first is empty while the second's is
    // corpus-sized BECAUSE its drop count is — the delta between the two
    // rows is the drops-proportional part of the bill
    val auditBase = Curation.Config(exactDedup = false, minTokens = 1,
      requireQuality = false, requireRepetitionOk = false)
    time("drops_audit_0", nDocs) {
      Curation.run(docs, "doc_id", "text",
          auditBase.copy(langs = Set("en", "de", "fr", "es", "zh", "und")),
          trackFunnel = false, trackDrops = true)
        .drops.map(_.count()).getOrElse(0L)
    }
    time("drops_audit_all", nDocs) {
      Curation.run(docs, "doc_id", "text", auditBase.copy(langs = Set("zh")),
          trackFunnel = false, trackDrops = true)
        .drops.map(_.count()).getOrElse(0L)
    }
    time("bloom_decon", nDocs) {
      Decontaminate.contaminatedIdsBloom(docs, "doc_id", "text", evalSet, "text",
        n = 5, fpp = 0.01).count()
    }
    time("search_topk", nDocs) {
      import spark.implicits._
      val qs = Seq((1L, "spark join window"), (2L, "vector hash stream key"),
        (3L, "customer query batch data")).toDF("q_id", "q_text")
      Search.keywordTopK(docs, qs, "doc_id", "text", "q_id", "q_text", k = 10).count()
    }
    time("quantiles", nDocs) {
      Stats.exactQuantiles(docs, TextAnalysis.tokenCount(col("text")),
        Seq(100, 500, 900, 990)).count()
    }
    time("mixing", nDocs) {
      // docs carry no source column here; derive a synthetic 16-way one
      val srcd = docs.withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(16))))
      val shares = (0 until 16).map(i => s"s$i" -> 0.05).toMap
      Mixing.mixToBudget(srcd, "doc_id", "source", "text", shares, budgetTokens = 1000000L).count()
    }
    time("url_dedup", nDocs) {
      // synthetic messy URLs: ~nDocs/50 distinct pages after normalization
      val pages = docs.withColumn("url", concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.Site")).otherwise(lit("https://site")),
        pmod(col("doc_id"), lit(20)), lit(".example/p/"),
        (col("doc_id") % math.max(1L, nDocs / 50)).cast("string"),
        when(col("doc_id") % 3 === 0, lit("?utm_source=x")).otherwise(lit(""))))
      Urls.urlDedup(pages, "doc_id", "url").count()
    }
    time("dsir_votes", nDocs) {
      val target = docs.where(col("doc_id") % 11 === 0)
      Dsir.voteScores(docs, target, "doc_id", "text")
        .agg(sum(col("margin"))).collect()
      nDocs
    }
    time("dsir_weights", nDocs) {
      val target = docs.where(col("doc_id") % 11 === 0)
      val lambdas = Dsir.logRatios(docs, target, "text", buckets = 10000)
      Dsir.logWeights(docs, "doc_id", "text", lambdas)
        .agg(sum(col("log_w"))).collect()
      nDocs
    }
    time("quality_clf", nDocs) {
      // train on a fixed-size sample (the production shape: labels are
      // sampled, scoring is the corpus-wide pass being measured); the
      // negative sample is vowel-mangled so the model has real signal to
      // learn — corpus docs should then score as positives
      val pos = docs.where(col("doc_id") % 97 === 0).limit(2000).select("text")
      val neg = docs.where(col("doc_id") % 101 === 0).limit(2000)
        .select(translate(col("text"), "aeiou", "zqxjv").as("text"))
      val model = QualityClassifier.train(pos, neg, "text",
        buckets = 1 << 14, iters = 5)
      docs.where(QualityClassifier.probability(col("text"), model) >= 0.5).count()
    }
    time("chunking", nDocs) {
      Chunking.slidingWindows(docs, "doc_id", "text", size = 64, stride = 48)
        .select(md5(col("chunk_text")).as("h"))
        .agg(count(col("h"))).collect()(0).getLong(0)
    }
    time("sessionize", nDocs) {
      // synthetic event stream: ~nDocs events over nDocs/64 entities
      val ev = docs.select(col("doc_id").as("event_id"),
        pmod(col("doc_id"), lit(math.max(1L, nDocs / 64))).as("user_id"),
        (col("doc_id") * 37L % 1000000000L).as("ts_ms"))
      graft.streaming.Sessions.sessionStats(ev, "user_id", "ts_ms",
        "event_id", gapMs = 100000L).count()
    }
    val evs = docs.select(col("doc_id").as("tie"),
      pmod(col("doc_id"), lit(math.max(1L, nDocs / 64))).as("k"),
      (col("doc_id") * 37L % 1000000000L).as("ts"))
    time("asof_join", nDocs) {
      val left = evs.where(pmod(col("tie"), lit(3)) === 0)
      val right = evs.where(pmod(col("tie"), lit(3)) =!= 0)
        .withColumn("v", col("tie"))
      graft.engine.AsofJoin.asof(left, right, "k", "ts", "tie", Seq("v"),
        horizon = 10000000L).count()
    }
    time("range_join", nDocs) {
      val pts = evs.where(pmod(col("tie"), lit(3)) === 0)
        .select(col("k"), col("ts"), col("tie").as("pid"))
      val iv = evs.where(pmod(col("tie"), lit(50)) === 1)
        .select(col("k"), col("ts").as("st"),
          (col("ts") + 200000L).as("en"), col("tie").as("iid"))
      graft.engine.RangeJoin.pointInInterval(pts, iv, "k", "ts", "st", "en",
        bucketWidth = 200000L).count()
    }
    time("html_extract", nDocs) {
      val html = concat(lit("<html><body><script>var j = 1 < 2;</script><p>"),
        col("text"), lit("</p><ul><li>x</li></ul></body></html>"))
      docs.select(md5(Html.toText(html)).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    time("interval_join", nDocs) {
      val ls = evs.where(pmod(col("tie"), lit(3)) === 0)
        .select(col("k"), col("ts").as("ls"), (col("ts") + 150000L).as("le"),
          col("tie").as("lid"))
      val rs = evs.where(pmod(col("tie"), lit(50)) === 1)
        .select(col("k"), col("ts").as("rs"), (col("ts") + 300000L).as("re"),
          col("tie").as("rid"))
      graft.engine.RangeJoin.intervalOverlap(ls, rs, "k", "ls", "le", "rs", "re",
        bucketWidth = 300000L).count()
    }
    time("shard_export", nDocs) {
      Sharding.shardAssignments(docs, "doc_id", nShards = 256, seed = 42)
        .agg(sum(col("pos"))).collect()
      nDocs
    }
    time("media_decode", nDocs) {
      // real BMP/WAV payloads synthesized from the text, decoded + resized +
      // windowed: the full multimodal pass over ~nDocs binary payloads
      val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
      Multimodal.extractFeatures(Multimodal.resizeMedia(media, maxDim = 8))
        .toDF().agg(sum(col("n_bytes"))).collect()
      nDocs
    }
    time("audio_windows", nDocs) {
      val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
      Multimodal.audioWindows(media, windowMs = 30, hopMs = 20)
        .agg(sum(col("n_frames"))).collect()
      nDocs
    }
    val queries = emb.where(col("vec_id") < 10)
    time("quantize", nVecs) {
      // consume the codes, not just the ranges — a range-only action lets
      // Catalyst prune the code lambda and times nothing but min/max
      Quantize.quantizeAll(emb, "vec_id", "embedding")
        .agg(sum(aggregate(col("codes"), lit(0L), (a, c) => a + c))).collect()
      nVecs
    }
    time("quantized_topk", nVecs) {
      val qc = Quantize.quantizeAll(emb, "vec_id", "embedding")
      Quantize.quantizedTopK(qc, queries, "vec_id", "embedding", k = 3).count()
    }
    time("lsh_topk", nVecs) {
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 3).count()
    }
    time("semdedup", nVecs) {
      Dedup.semanticDedup(emb, "vec_id", "embedding",
        Dedup.signCluster(col("embedding"), 14), tau = 0.99,
        maxClusterSize = 2000).where(col("kept")).count()
    }
    // data-map k-means: 2 Lloyd iterations = 2 scans + 2 (cell,pos)-keyed
    // aggregates; driver state is k × dims doubles
    time("kmeans", nVecs) {
      val (_, assigned) = Similarity.kmeans(emb, "vec_id", "embedding",
        k = 64, iters = 2)
      assigned.groupBy("cluster").count().count()
    }
    // IVF-PQ composed: coarse cells prune the ADC stream to nProbe/nCells
    // of the corpus; per-pair ADC expression on the probed join only
    time("ivfpq_topk", nVecs) {
      val (centroids, _) = Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCells = 64, iters = 1)
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
      val index = Similarity.ivfPqIndex(emb, "vec_id", "embedding", centroids, books)
      Similarity.ivfPqTopK(centroids, books, index, queries,
        "vec_id", "embedding", k = 3, nProbe = 8, rerank = 64).count()
    }
    // round-5e: corpus-global segment dedup WITH reconstruction — the
    // replicated corpus is the worst case (every window appears `mult`
    // times, every doc is rewritten, so the text-side join cannot
    // broadcast); consume the rebuilt text so the rewrite isn't pruned
    time("seg_dedup", nDocs) {
      Lines.dedupSegments(docs, "doc_id", "text", segSize = 5, minDocs = 2)
        .agg(sum(length(col("clean_text"))), sum(col("n_dropped"))).collect()
      nDocs
    }
    time("novelty", nDocs) {
      Lines.noveltyStats(docs, "doc_id", "text", n = 3)
        .agg(sum(col("n_novel")), sum(col("n_grams"))).collect()
      nDocs
    }
    time("fuzzy_decon", nDocs) {
      Decontaminate.fuzzyContaminated(docs, "doc_id", "text",
        docs0.where(col("doc_id") < 20).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 5, jaccardNum = 3, jaccardDen = 10).count()
    }
    time("template_dedup", nDocs) {
      Dedup.templateGroups(docs, "text", "doc_id")
        .agg(sum(col("n_dups")), sum(col("n_variants"))).collect()
      nDocs
    }
    time("datacard", nDocs) {
      Stats.dataCard(docs, "doc_id", "text").count()
      nDocs
    }
    time("gram_drift", nDocs) {
      Stats.gramDrift(docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "text", n = 1, k = 50).count()
      nDocs
    }
    time("nfc_normalize", nDocs) {
      docs.select(md5(graft.pipeline.textExpressions
        .unicodeNormalize(col("text"), "NFC", stripInvisible = true)).as("h"))
        .agg(count(col("h"))).collect()
      nDocs
    }
    time("snapshot_diff", nDocs) {
      Incremental.snapshotDiff(
        docs.where(col("doc_id") % 10 =!= 0), docs, "doc_id", "text").count()
    }
    time("substring_dedup", nDocs) {
      Lines.removeDuplicateSpans(docs, "doc_id", "text", spanLen = 10, minDocs = 2)
        .agg(sum(length(col("clean_text"))), sum(col("n_removed"))).collect()
      nDocs
    }
    time("cluster_cap", nVecs) {
      Sampling.capPerGroup(
        emb.select(col("vec_id"), Dedup.signCluster(col("embedding"), 8).as("cell")),
        "cell", "vec_id", n = 1000).count()
    }
    time("c4_rules", nDocs) {
      docs.select(C4Rules.cleanPage(regexp_replace(col("text"), "\\. ", ".\n")).as("c"))
        .agg(sum(col("c.n_kept")), sum(length(col("c.text_clean")))).collect()
      nDocs
    }
    time("epoch_expand", nDocs) {
      Mixing.epochExpand(
        docs.withColumn("source", concat(lit("src"), (col("doc_id") % 20).cast("string"))),
        "doc_id", "source",
        (0 until 20).map(k => s"src$k" -> (k % 4 + 1, 2)).toMap).count()
    }
    time("pagerank", nDocs) {
      // page-level href extraction + domain collapse at full corpus width,
      // then 3 integer iterations on the (bounded) domain graph
      val pages = docs.select(col("doc_id"),
        concat(lit("https://site"), (col("doc_id") % 500).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string")).as("url"),
        concat(lit("<p>x</p><a href=\"https://site"),
          ((col("doc_id") * 7 + 1) % 500).cast("string"),
          lit(".org/\">l</a><a href=\"https://site"),
          ((col("doc_id") * 13 + 3) % 500).cast("string"),
          lit(".org/\">l</a>")).as("html"))
      val edges = LinkGraph.domainEdges(pages, "url", "html")
      LinkGraph.pageRankInt(edges, iters = 3)
        .agg(sum(col("mass"))).collect()(0).getLong(0)
    }
    time("outliers", nVecs) {
      Outliers.topOutliers(emb, "vec_id", "embedding", k = 50)
        .agg(sum(col("dist"))).collect()
      nVecs
    }
    time("random_project", nVecs) {
      emb.select(Similarity.randomProject(col("embedding"), 16).as("p"))
        .agg(sum(element_at(col("p"), 1))).collect()
      nVecs
    }
    time("projected_topk", nVecs) {
      Similarity.projectedTopK(emb, emb.where(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, outDims = 16, rerank = 32).count()
    }
    // the replication fixture is winnow's worst case: every print bucket
    // holds all `mult` copies, so pair generation squares — the same
    // lesson as SemDeDup: run exact dedup FIRST (here the bucket cap at
    // mult/2 condemns the degenerate buckets and measures the scan/cap
    // path; the second line measures real pair throughput post-collapse)
    time("winnow_scan", nDocs) {
      Dedup.winnowedPairs(docs, "doc_id", "text", k = 5, w = 4,
          minShared = 2, maxBucketSize = math.max(1, mult / 2))
        .agg(sum(col("n_shared"))).collect()
      nDocs
    }
    time("winnow_pairs", nDocs / mult) {
      val collapsed = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
      Dedup.winnowedPairs(collapsed, "doc_id", "text", k = 5, w = 4, minShared = 2)
        .agg(sum(col("n_shared"))).collect()
      nDocs / mult
    }
    time("anchor_terms", nDocs) {
      val pages = docs.select(col("doc_id"),
        concat(lit("https://site"), (col("doc_id") % 500).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string")).as("url"),
        concat(lit("<a href=\"https://site"),
          ((col("doc_id") * 7 + 1) % 500).cast("string"),
          lit(".org/\">read site docs now</a>")).as("html"))
      LinkGraph.anchorTerms(pages, "url", "html", topK = 5)
        .agg(sum(col("cnt"))).collect()(0).getLong(0)
    }
    // KLL sketch in the APPROXIMATE regime: open domain (doc_id-salted
    // lengths make distinct ~ rows), capacity 1024 — state stays O(k·log)
    // per partial buffer and only sketches cross the shuffle
    time("kll_quantiles", nDocs) {
      docs.select((TextAnalysis.tokenCount(col("text")) * 1000 +
          (col("doc_id") % 1000)).as("v"))
        .agg(QuantileSketch.quantiles(col("v"), Seq(500, 990), capacity = 1024))
        .collect()
      nDocs
    }
    // WARC export + streaming re-parse: the CommonCrawl shard path —
    // member-per-record gzip write, record-at-a-time parse off the
    // PortableDataStream (no shard ever materializes in memory)
    val warcTmp = System.getProperty("java.io.tmpdir") + "/curation_stress_warc"
    time("warc_write", nDocs) {
      Warc.writeWet(docs.select(
          concat(lit("https://c.example/"), col("doc_id")).as("uri"),
          lit("2026-01-01T00:00:00Z").as("date"), col("text")),
        warcTmp, shards = 64)
      nDocs
    }
    time("warc_read", nDocs) {
      Warc.readWarcClean(spark, warcTmp).count()
    }
    // phrase search: positional postings filtered to phrase tokens
    // SCAN-SIDE by the broadcast join — only candidate postings shuffle,
    // then two bounded aggregates (anchor votes, per-doc hits)
    time("phrase_search", nDocs) {
      val qs = spark.createDataFrame(Seq((1, "table value"), (2, "fast merge"),
        (3, "key agg row"))).toDF("q_id", "q_text")
      Search.phraseHits(docs, qs, "doc_id", "text", "q_id", "q_text")
        .agg(sum(col("n_hits"))).collect()
      nDocs
    }
    // store OPTIMIZE: the small-file compaction pass. The fixture must be
    // genuinely fragmented — writeFragmented (64 unaligned writer tasks,
    // each opening a file per directory it touches) is the accretion
    // pattern optimize exists to repair; DocStore.write would align the
    // shuffle and hand optimize a pre-compacted no-op store.
    time("store_optimize", nDocs) {
      val p = System.getProperty("java.io.tmpdir") + "/curation_stress_store"
      graft.engine.DocStore.writeFragmented(docs
        .select(lit("documents").as("table"), col("doc_id").cast("string").as("id"),
          lit(1L).as("version"), col("text").as("body")),
        p, tasks = 64)
      val st = graft.engine.DocStore.optimize(spark, p)
      println(s"CURATION_STRESS store_optimize_files ${st.filesBefore} -> ${st.filesAfter}")
      require(st.filesBefore > st.filesAfter,
        s"store_optimize fixture was not fragmented (${st.filesBefore} -> ${st.filesAfter})")
      nDocs
    }
    // Z-order clustered write: one min/max pass + scan-local Morton code +
    // range-partitioned sorted write (the layout cost a nightly OPTIMIZE
    // pays once to make every later box scan prune)
    time("zorder_write", nDocs) {
      val zTmp = System.getProperty("java.io.tmpdir") + "/curation_stress_z"
      ZOrder.writeClustered(
        docs.select(col("doc_id"), (col("doc_id") % 10007).cast("int").as("x"),
          ((col("doc_id") * 31) % 10007).cast("int").as("y")),
        zTmp, Seq("x", "y"), files = 64)
      nDocs
    }
    spark.stop()
  }
}
