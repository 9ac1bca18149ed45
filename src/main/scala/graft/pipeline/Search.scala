package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval over a document corpus: inverted postings, document
 * frequencies, and per-query top-k ranking — exact term-overlap and BM25
 * (Robertson/Spärck Jones probabilistic relevance; the non-negative
 * Lucene-style idf `ln(1 + (N - df + 0.5)/(df + 0.5))`).
 *
 * Curation jobs need retrieval, not just similarity: "find the training
 * documents about X" audits, retrieval-based contamination triage (which
 * corpus docs would a benchmark question retrieve?), and keyword-targeted
 * subset carving all reduce to per-query top-k over an inverted index.
 * The reference has no text-retrieval surface; this is part of the
 * LLM-pipeline extension alongside [[Decontaminate]] and [[Similarity]].
 *
 * Scale shape: postings are one explode + one map-side-combinable
 * hash-aggregate keyed by (token, doc). Queries are the small side — their
 * distinct tokens broadcast, so candidate generation touches only postings
 * of query terms (an equi-join on token), never the corpus row set. The
 * per-token candidate list is bounded by `maxDf` stopword pruning — a
 * query term appearing in half the corpus would otherwise fan out to N/2
 * candidates, which is a scan, not a retrieval. Ranking is the two-phase
 * bounded-heap [[Similarity.rankTopKPerQuery]]: nothing corpus-sized is
 * ever sorted in one reducer. At 100 TB the postings build is the one
 * corpus-wide shuffle; a real deployment persists it (like [[Dedup]]'s
 * band table) and amortizes it across query batches.
 */
object Search {

  /** The repo-wide tokenization idiom (== SketchHash.tokenize, DuckDB
    * `string_split_regex(trim(lower(text)), '\s+')`). */
  private def toks(c: Column): Column = TextAnalysis.tokens(c)

  /** Inverted postings: one row per (token, doc) with its term frequency.
    * One explode + one partial-aggregating groupBy; empty tokens (from
    * empty documents) are kept out on both the Spark and oracle side. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Per-token corpus statistics: document frequency and total term
    * frequency. Map-side combinable; #tokens << #postings. */
  def docFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))

  /** Stopword pruning: drop postings of tokens appearing in more than
    * `maxDf` documents. Bounds every query term's candidate fan-out — the
    * difference between retrieval and a corpus scan at scale. The df
    * aggregate re-derives from the postings (cheap, partial-agg), and the
    * keep set joins back as a semi join on token. */
  def prunePostings(p: DataFrame, maxDf: Long): DataFrame = {
    val keep = p.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select("token")
    p.join(keep, Seq("token"), "left_semi")
  }

  /** Exact-overlap keyword top-k: relevance is (#distinct query terms
    * matched, summed tf) lexicographically, ties broken by doc id asc —
    * all-integer scoring, so ranking is engine-portable bit-for-bit.
    * The composite packs into a double exactly while
    * `matched_tf < 1e9` and `#query terms <= ~9e3` (both far above any
    * real document/query; 1e12 << 2^53).
    *
    * Queries' distinct (query_id, token) pairs collect into a broadcast —
    * the same "queries are the small side" budget as the ANN paths. */
  def keywordTopK(docs: DataFrame, queries: DataFrame, idCol: String,
                  textCol: String, qIdCol: String, qTextCol: String, k: Int,
                  maxDf: Long = Long.MaxValue): DataFrame = {
    val p0 = postings(docs, idCol, textCol)
    val p = if (maxDf == Long.MaxValue) p0 else prunePostings(p0, maxDf)
    val qt = queries
      .select(col(qIdCol).as("query_id"), explode(toks(col(qTextCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
    val matched = p.join(broadcast(qt), Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("matched_terms"), sum("tf").as("matched_tf"))
    val scored = matched.withColumn("score",
      (col("matched_terms") * lit(1000000000L) + col("matched_tf")).cast("double"))
    Similarity.rankTopKPerQuery(scored, "query_id", "score", "doc_id", k)
      .select("query_id", "rank", "doc_id", "matched_terms", "matched_tf")
  }

  /** Positional postings: one row per (doc, token occurrence) with the
    * 0-based token index — the index structure phrase and proximity
    * queries need. ~L rows per doc of length L (vs the tf-collapsed
    * [[postings]]): a real deployment persists it pruned
    * ([[prunePostings]] applies unchanged: it keys on token). */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(toks(col(textCol))).as(Seq("pos", "token")))
      .where(col("token") =!= "")

  /** Exact phrase search: occurrences of each query phrase as CONSECUTIVE
    * tokens. The alignment trick makes this a single aggregate, no
    * self-join per phrase word: each posting that matches phrase word i
    * votes for anchor position (pos − i); an anchor collecting ALL m
    * distinct offsets is a full occurrence (repeated phrase words are
    * handled — the vote is keyed by offset, not token).
    *
    * Scale shape: phrase tokens broadcast; the corpus-sized postings
    * stream is filtered to candidate tokens SCAN-SIDE by the broadcast
    * join, so only postings of phrase words shuffle (stopword-heavy
    * phrases: prune first, same rule as keyword search). One aggregate to
    * (query, doc, anchor), one to (query, doc).
    *
    * Returns (query_id, doc_id, n_hits), docs with >= 1 full occurrence. */
  def phraseHits(docs: DataFrame, queries: DataFrame, idCol: String,
                 textCol: String, qIdCol: String, qTextCol: String): DataFrame = {
    val p = positionalPostings(docs, idCol, textCol)
    val qt = queries
      .select(col(qIdCol).as("query_id"),
        posexplode(toks(col(qTextCol))).as(Seq("offset", "token")))
      .where(col("token") =!= "")
    val qLen = qt.groupBy("query_id").agg(countDistinct("offset").as("m"))
    val anchors = p.join(broadcast(qt), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("offset")).as("anchor"))
      .agg(countDistinct("offset").as("n_offsets"))
    anchors.join(broadcast(qLen), Seq("query_id"))
      .where(col("n_offsets") === col("m") && col("anchor") >= 0)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** BM25 top-k (k1/b are the classic defaults). Corpus scalars (N, avgdl)
    * are one tiny aggregate collected to the driver — the same legitimate-
    * scalar budget as IVF centroids. Per-candidate work is a token-keyed
    * join against the (pruned) postings of query terms plus one doc-keyed
    * join to attach document length; the double `score` sums per-term
    * contributions, so exact bit equality across engines is NOT guaranteed
    * (summation order) — rank output is deterministic within this engine
    * via the (score desc, doc_id asc) tie-break, and correctness is
    * asserted differentially (SearchSpec) rather than via the DuckDB
    * hash oracle, per the no-raw-doubles oracle rule. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, qIdCol: String, qTextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = Long.MaxValue): DataFrame = {
    val p0 = postings(docs, idCol, textCol)
    val p = if (maxDf == Long.MaxValue) p0 else prunePostings(p0, maxDf)
    // document length from the unpruned postings (sum tf == token count)
    val docLen = p0.groupBy("doc_id").agg(sum("tf").as("dl"))
    val scalars = docLen.agg(count(lit(1)).as("n"), sum("dl").as("toks")).head()
    val nDocs = scalars.getLong(0)
    // empty corpus: sum(dl) is null (getLong would NPE) and avgdl is
    // meaningless — every downstream frame is empty anyway, so any finite
    // placeholder yields the correct empty result instead of a crash
    val avgdl = if (nDocs == 0L) 1.0 else scalars.getLong(1).toDouble / nDocs.toDouble
    val dfTab = p.groupBy("token").agg(count(lit(1)).as("df"))
    val qt = queries
      .select(col(qIdCol).as("query_id"), explode(toks(col(qTextCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
    // shrink postings to query terms FIRST (broadcast), then attach df
    // (token-keyed; post-shrink this side is tiny) and dl (doc-keyed)
    val cand = p.join(broadcast(qt), Seq("token"))
      .join(broadcast(dfTab.join(qt.select("token").distinct(), Seq("token"), "left_semi")), Seq("token"))
      .join(docLen, Seq("doc_id"))
    val idf = log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = cand.withColumn("contrib", contrib)
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"))
    Similarity.rankTopKPerQuery(scored, "query_id", "score", "doc_id", k)
      .select("query_id", "rank", "doc_id", "score")
  }
}
