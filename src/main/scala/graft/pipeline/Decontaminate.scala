package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training corpora: flag (or drop) training
 * documents that share word n-grams with an evaluation set — the exact
 * n-gram overlap rule used for public LM training sets (Brown et al. 2020,
 * appendix C uses 13-grams; `n` is a parameter here).
 *
 * Scale shape: benchmark suites are tiny relative to a 100 TB corpus, so
 * the distinct eval n-gram hash set is broadcast and the contamination test
 * is a broadcast left-semi hash join. The corpus side explodes its n-gram
 * hashes scan-locally (single-pass [[sketches.hashedShingles]] — no gram
 * strings materialized); corpus text never shuffles, only (id, gram_hash)
 * pairs survive past the scan, and with minHits=1 the semi-join + partial
 * distinct reduce that to bare ids before the only shuffle.
 */
object Decontaminate {

  /** (id, gram_hash): one row per distinct n-gram hash per document. */
  private def gramRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(sketches.hashedShingles(col(textCol), n)).as("gram_hash"))

  /** Distinct ids of `corpus` documents sharing >= `minHits` distinct word
    * n-grams with `evalSet`. Output column: contaminated_id. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
                      evalSet: DataFrame, evalTextCol: String,
                      n: Int = 13, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1: $minHits")
    val evalGrams = broadcast(
      evalSet.select(explode(sketches.hashedShingles(col(evalTextCol), n))
        .as("gram_hash")).distinct())
    val hits = gramRows(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gram_hash"), "left_semi")
    val flagged =
      if (minHits == 1) hits.select("id").distinct()
      else hits.groupBy("id").agg(count(lit(1)).as("n_hits")) // grams pre-distinct per doc
        .where(col("n_hits") >= minHits).select("id")
    flagged.select(col("id").as("contaminated_id"))
  }

  /** [[contaminatedIds]] with a scan-local Bloom prefilter: the eval
    * n-gram hashes (already the collect-to-driver-sized side — the plain
    * path broadcasts them) additionally build a [[Bloom.Filter]] whose
    * probe is applied BEFORE the semi-join, so ~(1 - fpp) of corpus gram
    * rows die inside the scan stage and never reach an operator boundary.
    * The exact semi-join then re-verifies the survivors, so the output is
    * identical to [[contaminatedIds]] — the bloom only shrinks the join
    * input (the thing that matters when the corpus side is 100 TB). */
  def contaminatedIdsBloom(corpus: DataFrame, idCol: String, textCol: String,
                           evalSet: DataFrame, evalTextCol: String,
                           n: Int = 13, minHits: Int = 1,
                           fpp: Double = 0.01): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1: $minHits")
    val evalHashes = evalSet
      .select(explode(sketches.hashedShingles(col(evalTextCol), n)).as("gram_hash"))
      .distinct().collect().map(_.getLong(0))
    val bloom = Bloom.build(evalHashes, math.max(1L, evalHashes.length.toLong), fpp)
    val spark = corpus.sparkSession
    import spark.implicits._
    val evalGrams = broadcast(evalHashes.toSeq.toDF("gram_hash"))
    val hits = gramRows(corpus, idCol, textCol, n)
      .where(Bloom.mightContain(col("gram_hash"), bloom))
      .join(evalGrams, Seq("gram_hash"), "left_semi")
    val flagged =
      if (minHits == 1) hits.select("id").distinct()
      else hits.groupBy("id").agg(count(lit(1)).as("n_hits"))
        .where(col("n_hits") >= minHits).select("id")
    flagged.select(col("id").as("contaminated_id"))
  }

  /** The audit direction: per EVAL item, how many distinct corpus
    * documents share at least one n-gram with it — "which benchmark
    * items leak most" (items with huge counts are usually boilerplate-
    * heavy prompts rather than true leaks, so the report drives n/minHits
    * tuning before the destructive drop). Eval items with zero hits are
    * reported with n_corpus_docs = 0.
    * Output: (eval_id, n_corpus_docs). Same broadcast shape as
    * [[contaminatedIds]] — only (corpus id, eval id) pairs survive the
    * scan, aggregated map-side by eval id. */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          evalSet: DataFrame, evalIdCol: String,
                          evalTextCol: String, n: Int = 13): DataFrame = {
    val evalGrams = broadcast(
      evalSet.select(col(evalIdCol).as("eval_id"),
        explode(sketches.hashedShingles(col(evalTextCol), n)).as("gram_hash")).distinct())
    val hits = gramRows(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gram_hash"))
      .select("eval_id", "id").distinct()
      .groupBy("eval_id").agg(count(lit(1)).as("n_corpus_docs"))
    evalSet.select(col(evalIdCol).as("eval_id")).distinct()
      .join(hits, Seq("eval_id"), "left_outer")
      .select(col("eval_id"), coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"))
  }

  /**
   * Fuzzy decontamination: flag corpus documents whose distinct word
   * n-gram set has Jaccard similarity >= `jaccardNum/jaccardDen` with some
   * eval document — the overlap rule used when eval items are paraphrased
   * or lightly edited into the crawl, where the any-shared-13-gram rule
   * either misses (grams broken by edits) or over-fires (one boilerplate
   * gram). The threshold is a RATIONAL (numerator/denominator) and the
   * test is integer cross-multiplication `den*|A∩B| >= num*|A∪B|` — no
   * float epsilon, so an external oracle reproduces it bit-exactly.
   *
   * Output: (contaminated_id, eval_doc_id, n_inter, n_union) — one row per
   * flagged corpus doc, matched to its best eval doc (highest Jaccard,
   * ties to the smallest eval id).
   *
   * Scale shape: the eval side is benchmark-sized, so its (eval_id,
   * gram_hash) pairs broadcast; corpus gram hashes explode scan-locally
   * (text never shuffles) and only (corpus id, eval id) pair counts cross
   * the one shuffle. Per-doc gram-set sizes ride the same scan. The
   * argmax window partitions by corpus id over at most |eval| rows each —
   * no corpus-sized partition exists anywhere in the plan.
   */
  def fuzzyContaminated(corpus: DataFrame, idCol: String, textCol: String,
                        evalSet: DataFrame, evalIdCol: String, evalTextCol: String,
                        n: Int = 5, jaccardNum: Int = 3, jaccardDen: Int = 10): DataFrame = {
    require(jaccardNum > 0 && jaccardDen > 0 && jaccardNum <= jaccardDen,
      s"threshold must be a fraction in (0,1]: $jaccardNum/$jaccardDen")
    val evalGrams = broadcast(
      evalSet.select(col(evalIdCol).as("eval_doc_id"),
        explode(sketches.hashedShingles(col(evalTextCol), n)).as("gram_hash")))
    val evalSizes = broadcast(
      evalSet.select(col(evalIdCol).as("eval_doc_id"),
        size(sketches.hashedShingles(col(evalTextCol), n)).cast("long").as("n_b")))
    val inter = gramRows(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gram_hash"))
      .groupBy("id", "eval_doc_id").agg(count(lit(1)).as("n_inter"))
    val corpusSizes = corpus.select(col(idCol).as("id"),
      size(sketches.hashedShingles(col(textCol), n)).cast("long").as("n_a"))
    val scored = inter
      .join(corpusSizes, Seq("id"))
      .join(evalSizes, Seq("eval_doc_id"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .where(col("n_inter") * jaccardDen >= col("n_union") * jaccardNum)
    import org.apache.spark.sql.expressions.Window
    val best = org.apache.spark.sql.functions.row_number().over(
      Window.partitionBy(col("id"))
        .orderBy((col("n_inter").cast("double") / col("n_union")).desc,
          col("eval_doc_id").asc))
    scored.withColumn("rn", best).where(col("rn") === 1)
      .select(col("id").as("contaminated_id"), col("eval_doc_id"),
        col("n_inter"), col("n_union"))
  }

  /** Corpus minus contaminated documents (left-anti against the flagged
    * id set — the write side of a decontamination job). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13, minHits: Int = 1): DataFrame = {
    val bad = contaminatedIds(corpus, idCol, textCol, evalSet, evalTextCol, n, minHits)
      .select(col("contaminated_id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /**
   * Embedding-space decontamination — the semantic companion to the
   * n-gram detectors: corpus documents whose embedding reaches cosine
   * `tau` against ANY eval-set embedding are flagged, catching the
   * paraphrased/translated/reformatted leakage that exact n-gram overlap
   * misses (and that modern eval suites worry about most).
   *
   * Scale shape: eval suites are benchmark-sized (10² – 10⁵ items), so the
   * eval side is BROADCAST and the check is one scan-local pass over the
   * corpus — a broadcast nested-loop left-semi with |corpus| × |eval|
   * codegen'd dot products and NO shuffle; the corpus side streams, only
   * ids survive. For an eval side too large to broadcast, pre-bucket both
   * sides (coarse k-means cells via [[Similarity.ivfBuild]], or
   * [[Dedup.signCluster]]) and run the same test per cell — the
   * [[Dedup.semanticDedup]] shape.
   *
   * Zero-norm embeddings (failed embedder outputs) score 0.0 and never
   * flag, matching [[Similarity.cosine]]'s contract. Output: the distinct
   * flagged ids as `contaminated_id`.
   */
  def semanticContaminatedIds(corpus: DataFrame, idCol: String, embCol: String,
                              evalSet: DataFrame, evalEmbCol: String,
                              tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val evalVecs = evalSet.select(col(evalEmbCol).as("__eval_vec"))
    corpus.select(col(idCol), col(embCol))
      .join(broadcast(evalVecs),
        Similarity.cosine(col(embCol), col("__eval_vec")) >= tau, "left_semi")
      .select(col(idCol).as("contaminated_id")).distinct()
  }

  /** Drop semantically contaminated documents: [[semanticContaminatedIds]]
    * as a left-anti filter over the corpus (pass the corpus frame already
    * joined with its embeddings, or a narrow (id, embedding) projection and
    * re-join wide columns by id downstream). */
  def semanticDecontaminate(corpus: DataFrame, idCol: String, embCol: String,
                            evalSet: DataFrame, evalEmbCol: String,
                            tau: Double): DataFrame = {
    val bad = semanticContaminatedIds(corpus, idCol, embCol, evalSet, evalEmbCol, tau)
      .select(col("contaminated_id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /**
   * Canary-string detection — the benchmark-suite variant of
   * decontamination: eval suites embed long random GUID "canary" strings
   * (the BIG-bench convention) precisely so corpus builders can grep for
   * verbatim leakage. Exact substring containment, not n-gram overlap:
   * a canary match is definitionally a leak, no tokenization ambiguity.
   *
   * Output: one row per (doc, canary) hit — (idCol, canary_idx, canary).
   * The canary list is a plan literal (it is config, not data), and the
   * scan runs the [[MultiContainsExpr]] Aho–Corasick automaton: ONE pass
   * over each document regardless of pattern count, so a thousand-entry
   * blocklist costs the same scan as two canaries. No shuffle, no join.
   */
  def canaryHits(corpus: DataFrame, idCol: String, textCol: String,
                 canaries: Seq[String]): DataFrame = {
    val names = array(canaries.map(lit(_)).toIndexedSeq: _*)
    corpus.select(col(idCol),
        explode(MultiContains.matchedIndices(col(textCol), canaries)).as("canary_idx"))
      .withColumn("canary", element_at(names, col("canary_idx") + 1))
  }
}
