package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The one-call curation driver: composes the pipeline operators into the
 * standard "raw corpus to training sequences" job behind a config, so a
 * production run is a config diff rather than a bespoke script. Stages
 * (each optional): URL dedup / per-domain cap -> boilerplate strip ->
 * exact dedup -> near-dup removal -> quality/repetition/structure/PII/
 * language gates (length threshold either fixed or derived from the
 * corpus's own token-count quantile) -> benchmark decontamination (exact
 * or bloom-prefiltered) -> DSIR target-conditioned selection -> source
 * mixing to a token budget -> weighted or budget sampling -> sequence
 * packing. Returns the curated docs plus the stage-attribution counts
 * that make the run auditable.
 */
object Curation {

  /** Source-mixing stage parameters: see [[Mixing.mixToBudget]]. */
  final case class MixConfig(srcCol: String, shares: Map[String, Double],
                             budgetTokens: Long)

  /** Per-source document cap: see [[Sampling.capPerGroup]]. */
  final case class CapConfig(srcCol: String, maxDocs: Int)

  /** URL-stage parameters: dedup on the normalized URL (first fetch wins)
    * and/or cap pages per registered domain. See [[Urls]]. */
  final case class UrlConfig(urlCol: String, dedup: Boolean = true,
                             domainCap: Option[Int] = None)

  /** Shard-export stage: deterministic global shuffle of the final corpus
    * (or packed sequences when `packBudget` is set) into `nShards`
    * reproducible shards. See [[Sharding]]. */
  final case class ShardConfig(nShards: Int, seed: Long = 42L)

  /** Corpus-global segment-dedup stage (CCNet paragraph dedup adapted to
    * token windows): see [[Lines.dedupSegments]]. */
  final case class SegDedupConfig(segSize: Int = 5, minDocs: Int = 2)

  /** Curriculum annotation: ordinal difficulty bucket from the global rank
    * of `scoreCol` (ties on the id). See [[Curriculum.difficultyBuckets]]. */
  final case class CurriculumConfig(scoreCol: String, nBuckets: Int = 10)

  /** C4 cleaning (Raffel et al. 2020 §2.2): line gates rewrite the text,
    * page gates drop the doc. See [[C4Rules]]. */
  final case class C4Config(minWords: Int = 5, minLines: Int = 3)

  /** Embedding-space decontamination — the "semantic" position of the
    * decon-mode switch (exact / bloom / fuzzy gate on token overlap; this
    * gates on meaning, catching paraphrased leaks no n-gram rule sees).
    * Requires `embCol` on the input frame and `evalEmbCol` on `evalSet`;
    * drops any doc whose embedding reaches cosine >= `tau` against ANY
    * eval embedding. Composes with the gram modes — both run when both
    * are configured. See [[Decontaminate.semanticDecontaminate]]. */
  final case class SemanticDeconConfig(embCol: String, evalEmbCol: String,
                                       tau: Double)

  /** Dedup-method agreement audit: when the MinHash near-dup stage runs,
    * ALSO run SimHash candidates (hamming <= `maxHamming`, `simhashBands`
    * band buckets) over the SAME pool and emit the
    * [[Dedup.pairAgreement]] (id1, id2, in_a, in_b) report as
    * `Result.audits("dedup_agreement")` — the method-comparison evidence a
    * pipeline reviews before trusting (or switching) its detector. */
  final case class AgreementConfig(simhashBands: Int = 4, maxHamming: Int = 3)

  /** ANN-backed near-dup over an embedding column (LSH-bucketed cosine
    * pairs at `threshold`, [[Similarity.embeddingNearDuplicates]]), with an
    * optional standing recall audit: when `recallAuditQueries` > 0, the
    * `recallAuditQueries` smallest ids are re-queried both exactly and
    * through the same LSH bucketing, and the per-query
    * [[Similarity.recallAtK]] report (query_id, n_exact, n_hit) lands in
    * `Result.audits("ann_recall")` — so a plane/band/cap change that
    * silently degrades the index shows up in the run's own artifact. */
  final case class EmbNearDupConfig(embCol: String, threshold: Double,
                                    planes: Int = 16, bands: Int = 8,
                                    recallAuditQueries: Int = 0,
                                    recallAuditK: Int = 10)

  final case class Config(
      extractHtml: Boolean = false,                // HTML-to-text before any text op
      c4Rules: Option[C4Config] = None,            // C4 line/page gates (post-URL stage)
      urls: Option[UrlConfig] = None,              // URL dedup/domain cap (pre-content)
      dsirK: Option[Int] = None,                   // DSIR Gumbel top-k (needs dsirTarget)
      dsirBuckets: Int = 10000,
      qualityModel: Option[QualityClassifier.Model] = None, // trained gate
      minProbability: Double = 0.5,                // threshold for qualityModel
      bpeModel: Option[Bpe.Model] = None,          // budget/packing counts in
                                                   // learned-tokenizer units
      boilerplateMinDocs: Option[Long] = None,     // strip segments shared by >= N docs
      segDedup: Option[SegDedupConfig] = None,     // full corpus-global segment dedup
                                                   // (distributed condemned set)
      substringSpanLen: Option[Int] = None,        // unaligned duplicated-span removal
                                                   // (Lee et al. sliding windows)
      exactDedup: Boolean = true,
      nearDupThreshold: Option[Double] = None,     // MinHash Jaccard, e.g. Some(0.8)
      nearDupKeepBest: Option[String] = None,      // score column: keep each cluster's
                                                   // best member instead of min id
      minTokens: Int = 10,
      minTokensPermille: Option[Int] = None,       // derive minTokens from the corpus
                                                   // token-count quantile (overrides minTokens)
      requireQuality: Boolean = true,
      requireRepetitionOk: Boolean = true,
      requireStructureOk: Boolean = false,
      dropPii: Boolean = false,                    // drop (vs scrub) docs with PII
      scrubPii: Boolean = false,                   // redact instead of dropping
      langs: Set[String] = Set.empty,              // empty = keep all languages
      decontaminationN: Int = 13,
      deconGram: Boolean = true,                   // run the token-overlap decon
                                                   // stage when evalSet is present
                                                   // (exact/bloom/fuzzy modes);
                                                   // false = semantic-only decon
      bloomDecontamination: Boolean = false,       // scan-local bloom prefilter path
      fuzzyDeconThreshold: Option[(Int, Int)] = None, // (num, den): Jaccard >= num/den
                                                   // fuzzy rule instead of any-shared-gram
      curriculum: Option[CurriculumConfig] = None, // annotate difficulty bucket
      sourceMix: Option[MixConfig] = None,         // per-source budget mixing
      sourceCap: Option[CapConfig] = None,         // <= n docs per source
      tokenBudget: Option[Long] = None,            // carve to ~B tokens
      packBudget: Option[Long] = None,             // emit seq_id when set
      shards: Option[ShardConfig] = None,          // emit shard/pos when set
      fixMojibake: Boolean = false,                // charset-repair rewrite (pre-C4)
      blocklist: Option[BlocklistConfig] = None,   // badwords gate (with `gates`)
      semanticDecon: Option[SemanticDeconConfig] = None, // embedding-space decon
      dedupAgreement: Option[AgreementConfig] = None,    // MinHash-vs-SimHash report
      embNearDup: Option[EmbNearDupConfig] = None) // ANN near-dup (+recall audit)

  /** C4-style badwords gate: drop docs whose blocked-token rate exceeds
    * `maxPermille` (integer math — no float thresholds). */
  final case class BlocklistConfig(words: Seq[String], maxPermille: Int = 150)

  /** `audits`: the standing trust reports the run emitted alongside its
    * output (dedup_agreement / ann_recall as configured) — materialized
    * EAGERLY at build time, same localCheckpoint reasoning as `drops`:
    * audit frames are parameter-sized (pair lists, per-query recall rows),
    * and a lazy plan would re-run the whole upstream pipeline when read
    * after the stage caches advance. */
  final case class Result(docs: DataFrame, stageCounts: Seq[(String, Long)],
                          drops: Option[DataFrame] = None,
                          audits: Map[String, DataFrame] = Map.empty)

  /** Runs the configured stages over (idCol, textCol); `evalSet` enables
    * decontamination. With `trackFunnel` each stage's surviving-row count
    * is recorded — the funnel a curation run reports; stage outputs are
    * persisted so the count action doesn't recompute the upstream lineage
    * (and each stage reads its predecessor's materialization, not the raw
    * scan). `trackFunnel = false` skips counts and persists, leaving one
    * lazily-planned job — except the DSIR stage, whose histogram collects
    * force it to persist the pool either way.
    *
    * With `trackDrops` the result additionally carries a per-document
    * audit frame (idCol, stage): each dropped document tagged with the
    * FIRST stage that removed it — the "why did my page disappear"
    * explainability question every production curation pipeline gets
    * asked. Cost contract: one ids-only anti-diff per stage, materialized
    * EAGERLY at build time (localCheckpoint — the lazy union would pin
    * every per-stage cached frame for the Result's lifetime, an unbounded
    * cache leak across repeated runs), against the cached stage frames
    * while they are still resident (trackDrops implies funnel-style
    * per-stage persists). The eager audit is sized by the TOTAL DROP
    * COUNT, never the corpus — rewrite-only stages diff to empty — and is
    * paid whether or not the caller reads `drops`; skip the flag when the
    * audit isn't wanted (CurationStress pins drops-proportional cost at
    * 100×). */
  def run(input: DataFrame, idCol: String, textCol: String, cfg: Config,
          evalSet: Option[DataFrame] = None, trackFunnel: Boolean = true,
          dsirTarget: Option[DataFrame] = None,
          trackDrops: Boolean = false): Result = {
    // fail fast, not silently: an agreement audit without the near-dup
    // stage it audits would vanish from Result.audits and the caller's
    // trust report would read as "no disagreements" (same discipline as
    // semanticDecon's missing-evalSet throw below)
    require(cfg.dedupAgreement.isEmpty || cfg.nearDupThreshold.isDefined,
      "dedupAgreement audits the near-dup stage: set nearDupThreshold too")
    val counts = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val dropParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val audits = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    var persisted: Option[DataFrame] = None
    var df = input
    def stage(name: String, next: DataFrame): DataFrame = {
      val cache = trackFunnel || trackDrops
      val out =
        if (cache) next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else next
      // `df` still holds the PREDECESSOR frame here (reassignment happens
      // after stage returns), so the ids-only except is exactly the docs
      // this stage removed. The diff MATERIALIZES now, while the
      // predecessor is still cached — a lazy plan evaluated after the
      // unpersist chain advances would re-run the whole upstream pipeline
      // once per stage (O(stages²) lineage work) instead of the one
      // anti-diff per stage this feature promises.
      if (trackDrops) {
        val lost = df.select(col(idCol))
          .except(out.select(col(idCol)))
          .withColumn("stage", lit(name))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        lost.count()
        dropParts += lost
      }
      if (trackFunnel) counts += (name -> out.count())
      if (cache) {
        persisted.foreach(_.unpersist())
        persisted = Some(out)
      }
      out
    }
    // materialize the INPUT once when stage caching is on: the FIRST
    // stage's own actions (e.g. near-dup candidate pairs, the agreement
    // audit, the drops anti-diff, the funnel count) would otherwise each
    // recompute the caller's input lineage from scratch — the same
    // "each stage reads its predecessor's materialization" contract the
    // per-stage persists below provide, applied to stage 0. Skipped when
    // the caller already persisted the frame (its cache, its lifecycle).
    if ((trackFunnel || trackDrops) &&
        df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted = Some(df)
    }
    // run-owned input persist, released before returning when NO stage()
    // call ever consumed it (a config enabling zero stages would otherwise
    // leave the caller's frame cached for the session)
    val inputFrame = df
    if (trackFunnel) counts += ("input" -> df.count())

    // raw crawl payloads become text before any content operator sees them
    if (cfg.extractHtml)
      df = stage("html_extract", df.withColumn(textCol, Html.toText(col(textCol))))

    // charset repair FIRST among text rewrites: mojibake would defeat
    // every downstream fingerprint/gate (a misdecoded duplicate hashes
    // differently, langId mis-scores the broken tokens); the repair is
    // provably-safe-only, so clean text passes through bit-identical
    if (cfg.fixMojibake)
      df = stage("fix_mojibake",
        df.withColumn(textCol, textExpressions.fixMojibake(col(textCol), maxPasses = 2)))

    // URL stage before any content work: a page fetched twice should cost
    // one content pass, not two. NULL-url rows are exempt from both
    // sub-stages (no URL != same URL), and survivors are selected by
    // id-semi-join so no user column is ever renamed or clobbered.
    cfg.urls.foreach { u =>
      // exempt predicate shared by both sub-stages: a null URL — or one
      // whose NORMALIZED form is empty (blank/fragment-only) — is missing,
      // not comparable; without the second clause every such row would
      // collapse onto one url_norm="" survivor (or one ""-domain cap group)
      def missingUrl = col(u.urlCol).isNull || Urls.normalize(col(u.urlCol)) === ""
      if (u.dedup) {
        val keep = Urls.urlDedup(df, idCol, u.urlCol).select(col("keep_id").as(idCol))
        df = stage("url_dedup", df.join(keep, Seq(idCol), "left_semi")
          .unionByName(df.where(missingUrl)))
      }
      u.domainCap.foreach { n =>
        val dom = Urls.registeredDomain(Urls.normalize(col(u.urlCol)))
        val withUrl = df.where(col(u.urlCol).isNotNull && dom =!= "")
        val keepIds = Sampling.capPerGroup(
          withUrl.select(col(idCol), dom.as("__graft_dom")),
          "__graft_dom", idCol, n).select(idCol)
        df = stage("domain_cap", df.join(keepIds, Seq(idCol), "left_semi")
          .unionByName(df.where(col(u.urlCol).isNull || dom === "")))
      }
    }

    // C4 cleaning after the URL stage (URL-first: a page fetched twice
    // should cost one content pass, not two) and before anything that
    // fingerprints text: line gates rewrite, page gates drop — both
    // scan-local, no shuffle
    cfg.c4Rules.foreach { c =>
      val cleaned = df
        .withColumn("__graft_c4", C4Rules.cleanPage(col(textCol), c.minWords, c.minLines))
        .where(col("__graft_c4.page_kept") === 1)
        .withColumn(textCol, col("__graft_c4.text_clean"))
        .drop("__graft_c4")
      df = stage("c4_rules", cleaned)
    }

    // boilerplate first: shared tails would otherwise defeat exact dedup
    // and pollute near-dup shingles; discovery aggregates, rewrite is
    // scan-local (no join)
    cfg.boilerplateMinDocs.foreach { minDocs =>
      val boiler = TextClean.boilerplateSegments(df, idCol, textCol, minDocs)
      df = stage("boilerplate",
        df.withColumn(textCol, TextClean.stripSegments(col(textCol), boiler)))
    }
    // corpus-global segment dedup (full-dedup regime, distributed condemned
    // set) runs where boilerplate does and for the same reason: shared
    // windows would defeat exact dedup and pollute near-dup shingles. The
    // rewritten text replaces textCol; the stat columns stay internal.
    cfg.segDedup.foreach { sd =>
      val cleaned = Lines.dedupSegments(df, idCol, textCol, sd.segSize, sd.minDocs)
        .withColumnRenamed("clean_text", textCol)
        .drop("n_segs", "n_dropped")
      df = stage("seg_dedup", cleaned)
    }
    // the deeper (unaligned) regime: duplicated spans at ANY offset; runs
    // after the cheaper aligned pass has already stripped the bulk
    cfg.substringSpanLen.foreach { len =>
      val cleaned = Lines.removeDuplicateSpans(df, idCol, textCol, spanLen = len)
        .withColumnRenamed("clean_text", textCol)
        .drop("n_tokens", "n_removed")
      df = stage("substring_dedup", cleaned)
    }
    if (cfg.exactDedup)
      df = stage("exact_dedup", Dedup.dropExactDuplicates(df, textCol, idCol))
    cfg.nearDupThreshold.foreach { t =>
      val pairs = Dedup.minhashNearDuplicates(df, idCol, textCol, threshold = t)
      // agreement audit BEFORE the drop, over the same pool the detector
      // saw: SimHash candidates at the configured hamming radius vs the
      // MinHash pairs that are about to decide survivors. Eager
      // localCheckpoint — pair lists are capped-bucket outputs (tiny), and
      // a lazy audit read after the stage caches advance would replay the
      // whole upstream pipeline.
      cfg.dedupAgreement.foreach { a =>
        val sim = Dedup.simhashCandidates(df, idCol, textCol, bands = a.simhashBands)
          .where(col("hamming") <= a.maxHamming)
          .select("id1", "id2")
        audits += "dedup_agreement" ->
          Dedup.pairAgreement(pairs.select("id1", "id2"), sim).localCheckpoint()
      }
      val kept = cfg.nearDupKeepBest match {
        case Some(scoreCol) =>
          // quality-aware survivor: each cluster keeps its best-scored
          // member (ties to min id) instead of the arbitrary min id
          val keepIds = Dedup.canonicalByScore(
              df.select(col(idCol), col(scoreCol)), idCol, scoreCol, pairs)
            .where(col("kept")).select(idCol)
          df.join(keepIds, Seq(idCol), "left_semi")
        case None => Dedup.dropNearDuplicates(df, pairs, idCol)
      }
      df = stage("near_dedup", kept)
    }
    // ANN-backed near-dup on embeddings (catches paraphrases MinHash's
    // lexical shingles miss), with its recall audit taken BEFORE the drop
    // so the report reflects the pool the index actually served
    cfg.embNearDup.foreach { e =>
      require(df.columns.contains(e.embCol),
        s"embNearDup requires column '${e.embCol}' on the input frame")
      if (e.recallAuditQueries > 0) {
        val emb = df.select(col(idCol), col(e.embCol))
        // deterministic bounded sample: the N smallest ids (a top-N, never
        // a global sort of the corpus)
        val queries = emb.orderBy(col(idCol)).limit(e.recallAuditQueries)
        val exact = Similarity.bruteForceTopK(emb, queries, idCol, e.embCol,
          k = e.recallAuditK)
        val approx = Similarity.lshTopK(emb, queries, idCol, e.embCol,
          k = e.recallAuditK, planes = e.planes, bands = e.bands)
        audits += "ann_recall" ->
          Similarity.recallAtK(exact, approx, e.recallAuditK).localCheckpoint()
      }
      val pairs = Similarity.embeddingNearDuplicates(df, idCol, e.embCol,
        e.threshold, preBucket = Some(true), planes = e.planes, bands = e.bands)
      df = stage("emb_near_dedup", Dedup.dropNearDuplicates(df, pairs, idCol))
    }
    // data-derived length threshold: the corpus's own p-quantile token
    // count (histogram-first, so deriving it is not a corpus sort). Only
    // computed when the quality gate will consume it — it is an extra
    // corpus pass — and an EMPTY surviving pool (aggressive upstream dedup,
    // all-null text) yields no quantile row: fall back to the static floor
    // instead of crashing the run on head()-of-empty.
    val minTok =
      if (!cfg.requireQuality) cfg.minTokens
      else cfg.minTokensPermille.map { p =>
        val q = Stats.exactQuantiles(df,
          TextAnalysis.tokenCount(col(textCol)), Seq(p)).collect()
        if (q.isEmpty) cfg.minTokens
        else math.max(1L, q(0).getLong(1)).toInt
      }.getOrElse(cfg.minTokens)
    val gates = scala.collection.mutable.ArrayBuffer[Column]()
    if (cfg.requireQuality) gates += TextAnalysis.qualityOk(col(textCol), minTokens = minTok)
    if (cfg.requireRepetitionOk) gates += TextAnalysis.repetitionOk(col(textCol))
    if (cfg.requireStructureOk) gates += TextAnalysis.structureOk(col(textCol))
    if (cfg.dropPii) gates += TextClean.piiFree(col(textCol))
    if (cfg.langs.nonEmpty)
      gates += TextAnalysis.langId(col(textCol)).isin(cfg.langs.toSeq.map(x => x: Any): _*)
    // single-node gate: one tokenization per doc (two getFields over the
    // CodegenFallback stats struct are not reliably subexpression-
    // eliminated) and Long threshold math (no ANSI overflow on huge docs)
    cfg.blocklist.foreach { bc =>
      gates += textExpressions.blocklistOk(col(textCol), bc.words, bc.maxPermille)
    }
    cfg.qualityModel.foreach { m =>
      gates += (QualityClassifier.probability(col(textCol), m) >= cfg.minProbability)
    }
    if (gates.nonEmpty)
      df = stage("gates", df.where(gates.reduce(_ && _)))
    if (cfg.scrubPii && !cfg.dropPii)
      df = stage("pii_scrub", df.withColumn(textCol, TextClean.scrub(col(textCol))))
    // the decon-mode switch: gram-based modes (exact default, bloom, fuzzy)
    // run below when deconGram is on; the semantic mode is its own stage
    // after this block. All compose — they catch independent leak channels.
    if (cfg.deconGram) evalSet.foreach { ev =>
      val cleaned =
        if (cfg.fuzzyDeconThreshold.isDefined) {
          val (num, den) = cfg.fuzzyDeconThreshold.get
          // fuzzy rule: whole-set Jaccard, robust to paraphrased leaks.
          // The eval frame needs an id column for the argmax report shape;
          // a synthetic text-hash id is fine since only contaminated_id is
          // consumed — but duplicate eval items must collapse FIRST, or the
          // colliding ids double-count every intersection and over-flag
          val evIds = ev.dropDuplicates(textCol)
            .withColumn("__graft_eval_id", xxhash64(col(textCol)))
          val bad = Decontaminate.fuzzyContaminated(df, idCol, textCol,
              evIds, "__graft_eval_id", textCol,
              n = cfg.decontaminationN, jaccardNum = num, jaccardDen = den)
            .select(col("contaminated_id").as(idCol))
          df.join(bad, Seq(idCol), "left_anti")
        } else if (cfg.bloomDecontamination) {
          val bad = Decontaminate.contaminatedIdsBloom(df, idCol, textCol,
              ev, textCol, n = cfg.decontaminationN)
            .select(col("contaminated_id").as(idCol))
          df.join(bad, Seq(idCol), "left_anti")
        } else Decontaminate.decontaminate(df, idCol, textCol,
          ev, textCol, n = cfg.decontaminationN)
      df = stage("decontaminated", cleaned)
    }
    // semantic decon after the gram-based mode (both run when both are
    // configured — token overlap and meaning are independent leak
    // channels); eval embeddings broadcast, the corpus never shuffles
    cfg.semanticDecon.foreach { sd =>
      require(df.columns.contains(sd.embCol),
        s"semanticDecon requires column '${sd.embCol}' on the input frame")
      val ev = evalSet.getOrElse(throw new IllegalArgumentException(
        "semanticDecon requires evalSet (with its embedding column)"))
      df = stage("decon_semantic", Decontaminate.semanticDecontaminate(
        df, idCol, sd.embCol, ev, sd.evalEmbCol, sd.tau))
    }
    // target-conditioned selection after the hygiene stages: DSIR picks
    // from the cleaned pool, so junk can't ride in on a high domain score.
    // logRatios COLLECTS two histograms, so this stage materializes the
    // pool even with trackFunnel=false (the one exception to the
    // single-lazy-job contract) — otherwise the whole upstream lineage
    // would run three times (histograms, selection, final action).
    for (tgt <- dsirTarget; k <- cfg.dsirK) {
      val pool =
        if (trackFunnel) df // predecessor stage output is already persisted
        // session-cached (see the Dedup band table policy): the pool must
        // stay resident for the caller's final action, so it cannot be
        // released here; long-lived drivers clearCache() between runs
        else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lambdas = Dsir.logRatios(pool, tgt, textCol, cfg.dsirBuckets)
      df = stage("dsir_select", pool.join(
        Dsir.resampleTopK(pool, idCol, textCol, lambdas, k).select(idCol),
        Seq(idCol), "left_semi"))
    }
    cfg.sourceMix.foreach { m =>
      df = stage("source_mix",
        Mixing.mixToBudget(df, idCol, m.srcCol, textCol, m.shares, m.budgetTokens))
    }
    cfg.sourceCap.foreach { c =>
      df = stage("source_cap",
        Sampling.capPerGroup(df, c.srcCol, idCol, c.maxDocs).drop("rank"))
    }
    // budget/packing counts: learned-tokenizer units when a BPE model is
    // configured (what a training run actually budgets in), otherwise the
    // whitespace idiom; both are scan-local single passes
    def budgetTokens: Column = cfg.bpeModel
      .map(m => Bpe.tokenCount(col(textCol), m).cast("long"))
      .getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
    cfg.tokenBudget.foreach { b =>
      val tok = df.select(col(idCol), budgetTokens.as("__nt"))
      df = stage("token_budget", df.join(
        Packing.tokenBudgetSample(tok, idCol, "__nt", b).select(idCol), Seq(idCol)))
    }
    cfg.packBudget.foreach { b =>
      val tok = df.select(col(idCol), budgetTokens.as("__nt"))
      val packed = Packing.packSequences(tok, idCol, "__nt", b)
        .select(col(idCol), col("seq_id"))
      df = df.join(packed, Seq(idCol))
    }
    // curriculum annotation before export: the bucket rides into the
    // shards so a training run can schedule easy-to-hard without a
    // second pass over the corpus
    cfg.curriculum.foreach { cc =>
      require(!df.columns.contains("bucket"),
        "curriculum stage would clobber an existing 'bucket' column")
      val buckets = Curriculum.difficultyBuckets(
        df.select(col(idCol), col(cc.scoreCol)), idCol, cc.scoreCol, cc.nBuckets)
        .select(col(idCol), col("bucket"))
      df = df.join(buckets, Seq(idCol))
    }
    // export tail: reproducible shard + read position for the training
    // run, keyed on packed sequences when packing is on (a sequence
    // co-travels), else on the document id
    cfg.shards.foreach { sc =>
      val taken = df.columns.toSet.intersect(Set("shard", "pos"))
      require(taken.isEmpty, "shard-export stage would clobber existing " +
        s"column(s): ${taken.mkString(", ")} — rename or drop them first")
      val key = if (cfg.packBudget.isDefined) "seq_id" else idCol
      val assign = Sharding.shardAssignments(
        df.select(key).distinct(), key, sc.nShards, sc.seed)
      df = df.join(assign, Seq(key))
    }
    // The per-stage `lost` frames were persisted only so each anti-diff
    // could materialize against its cached predecessor; returning their
    // lazy union would pin every one of them for the Result's lifetime
    // (repeated runs in a long session would accumulate cached partitions
    // indefinitely). localCheckpoint (eager) copies the tiny ids+stage
    // union into its own storage — lineage severed — so the parts can be
    // unpersisted NOW and the returned frame stays valid.
    val drops =
      if (trackDrops && dropParts.nonEmpty) {
        val u = dropParts.reduce(_.unionByName(_)).localCheckpoint()
        dropParts.foreach(_.unpersist())
        Some(u)
      } else None
    // zero-stage degenerate config: the stage-0 input persist was never
    // handed off to a stage()'s unpersist chain — release it now
    if (persisted.exists(_ eq inputFrame)) {
      inputFrame.unpersist()
      persisted = None
    }
    Result(df, counts.toSeq, drops = drops, audits = audits.toMap)
  }
}
