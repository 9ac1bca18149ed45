package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM scoring — the perplexity-proxy quality filter: documents
 * whose tokens are mostly outside the corpus's frequent vocabulary (or
 * assign low unigram likelihood) are boilerplate/noise candidates. The
 * KenLM-filter shape without the external model: the corpus IS the model.
 *
 * Scale shape: vocabulary extraction is one token-count aggregate ordered
 * by (count desc, token asc) — the only corpus-wide shuffle, over (token,
 * count) pairs, not documents; the top-V vocabulary is driver-sized by
 * construction (V is a parameter) and broadcasts back into scan-local
 * per-document expressions. Scoring shuffles nothing.
 */
object LmScore {

  /** Top-V corpus vocabulary by frequency: (token, cnt), deterministic
    * tie-break (count desc, token asc). */
  def vocabulary(df: DataFrame, textCol: String, topV: Int): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topV)

  /** Per-document in-vocabulary / out-of-vocabulary token counts against a
    * collected vocabulary — scan-local, no join, no shuffle. One
    * tokenization pass with an O(1) hash probe per token
    * ([[UnigramCoverageExpr]]): per-token cost is independent of |vocab|,
    * so the V=100k regime costs the same as V=100. The vocab rides the
    * serialized plan once per executor, exactly like the literal array the
    * builtin cross-check ([[vocabCountsBuiltin]]) uses. */
  def vocabCounts(df: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[String]): DataFrame = {
    val cov = textExpressions.unigramCoverage(col(textCol), vocab)
    df.withColumn("__cov", cov).select(col(idCol),
      col("__cov.n_invocab").as("n_invocab"),
      col("__cov.n_oov").as("n_oov"))
  }

  /** The pure-builtin formulation of [[vocabCounts]] (literal-array
    * membership, O(|vocab|) compares per token) — kept as the parity
    * cross-check for the single-pass expression; do not use on large
    * vocabularies. */
  def vocabCountsBuiltin(df: DataFrame, idCol: String, textCol: String,
                         vocab: Seq[String]): DataFrame = {
    // same fold as the expression's probe set — through the UTF8String
    // case fold the token side uses, not default-locale String.toLowerCase
    val vocabArr = array(vocab.map(w => lit(SketchHash.foldCase(w))): _*)
    val toks = TextAnalysis.tokens(col(textCol))
    val inVocab = size(filter(toks, t => array_contains(vocabArr, t)))
    df.select(col(idCol),
      inVocab.cast("int").as("n_invocab"),
      (size(toks) - inVocab).cast("int").as("n_oov"))
  }

  /** Top-V corpus bigram vocabulary: ("w1 w2", cnt), deterministic
    * tie-break (count desc, gram asc). Same aggregate shape as
    * [[vocabulary]]; grams come from the single-pass
    * [[WordNgramsExpr]] (builtin-parity asserted in CurationOpsSpec —
    * the builtin's slice-per-gram walk is O(n²) per doc). */
  def bigramVocabulary(df: DataFrame, textCol: String, topV: Int): DataFrame =
    df.select(explode(textExpressions.wordNgrams(col(textCol), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(topV)

  /** Per-document in-/out-of-vocabulary BIGRAM counts — the sharper
    * fluency signal on top of unigram coverage (word-salad text has
    * ordinary unigrams but improbable bigrams). Scan-local: one token
    * walk with O(1) hash-set probes ([[BigramCoverageExpr]]); docs under
    * 2 tokens report (0, 0). */
  def bigramCounts(df: DataFrame, idCol: String, textCol: String,
                   bigrams: Seq[String]): DataFrame = {
    val cov = textExpressions.bigramCoverage(col(textCol), bigrams)
    df.withColumn("__cov", cov).select(col(idCol),
      col("__cov.n_invocab_bigrams").as("n_invocab_bigrams"),
      col("__cov.n_oov_bigrams").as("n_oov_bigrams"))
  }

  /** The pure-builtin formulation of [[bigramCounts]] (literal-array
    * membership over materialized gram strings) — kept as the parity
    * cross-check for the single-pass expression; O(grams x vocab), do not
    * use on large corpora. */
  def bigramCountsBuiltin(df: DataFrame, idCol: String, textCol: String,
                          bigrams: Seq[String]): DataFrame = {
    // same normalization as the expression's probe set: single-space gram
    // shape + the UTF8String case fold the token side uses
    val arr = array(bigrams.map(g =>
      lit(SketchHash.foldCase(g.trim.split("\\s+").mkString(" ")))): _*)
    val grams = TextAnalysis.wordNgrams(col(textCol), 2)
    val inV = size(filter(grams, g => array_contains(arr, g)))
    df.select(col(idCol),
      inV.cast("int").as("n_invocab_bigrams"),
      (size(grams) - inV).cast("int").as("n_oov_bigrams"))
  }

  /** Mean unigram log-likelihood per token under the add-one-smoothed
    * corpus unigram model (OOV mass = 1/(total+V)). The continuous score
    * behind the [[vocabCounts]] integers; higher = more ordinary text. */
  def unigramLogLikelihood(textCol: Column, vocabCounts: Map[String, Long],
                           totalTokens: Long): Column = {
    val v = vocabCounts.size
    val oovLp = math.log(1.0 / (totalTokens + v + 1.0))
    val entries = vocabCounts.toSeq.sortBy(_._1)
    val lpOf = map(entries.flatMap { case (t, c) =>
      Seq(lit(t), lit(math.log((c + 1.0) / (totalTokens + v + 1.0))))
    }: _*)
    val toks = TextAnalysis.tokens(textCol)
    aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(lpOf, t), lit(oovLp))) /
      greatest(size(toks), lit(1))
  }
}
