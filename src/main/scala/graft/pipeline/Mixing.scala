package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Source mixing: carve a training corpus to a global token budget with
 * target proportions per source/domain (the "data mixture" step of
 * LLM-corpus assembly — fixed-weight mixtures over domains, applied here
 * as deterministic subsampling rather than epoch weighting).
 *
 * Given shares s_d (not necessarily summing to 1) and a token budget B,
 * each source keeps rate `r_d = min(1, s_d * B / tokens_d)` of its
 * documents by the md5-uniform keep rule ([[Sampling.hashUniform]]): the
 * expected kept token mass per source is `min(s_d * B, tokens_d)`, the
 * decision is per-row, rerun-stable and engine-portable, and sources
 * absent from the share map are dropped wholesale.
 *
 * Scale shape: totals are one map-side-combinable aggregate keyed by
 * source (#sources << #docs) collected to the driver — the same
 * legitimate-scalar budget as IVF centroids — and rates re-join the
 * corpus as a broadcast hash join, so corpus rows never shuffle: one
 * scan, one broadcast, one scan-local filter.
 */
object Mixing {

  /** Per-source document and token totals (tokens by the repo-wide
    * whitespace idiom). */
  def sourceTokenTotals(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        // coalesce: a source whose every text is null sums to NULL, and the
        // driver-side getLong would NPE the whole mix job — zero tokens is
        // the honest total for such a source
        coalesce(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")), lit(0L))
          .as("n_tokens"))

  /** Keep rates per source for `shares` against `budgetTokens`. Exposed so
    * callers can audit the planned mixture before filtering. Arithmetic is
    * pinned as `(share * budget) / tokens` so an external engine (the
    * DuckDB oracle) reproduces the rates bit-for-bit from the same
    * integers. */
  def mixRates(df: DataFrame, srcCol: String, textCol: String,
               shares: Map[String, Double], budgetTokens: Long): Map[String, Double] = {
    val totals = sourceTokenTotals(df, srcCol, textCol).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    shares.flatMap { case (src, share) =>
      totals.get(src).map { toks =>
        src -> math.min(1.0, share * budgetTokens.toDouble / toks.toDouble)
      }
    }
  }

  /** Temperature-scaled shares from observed token masses — the
    * multilingual-LM mixing rule (mT5/XLM-R, public): share_d ∝ p_d^(1/T)
    * where p_d is the source's fraction of corpus tokens. T=1 reproduces
    * the natural distribution; T→∞ approaches uniform; T<1 sharpens
    * toward the big sources. Output sums to 1 and feeds [[mixToBudget]]
    * directly, so "mix with temperature 3.3" is two calls. */
  def temperatureShares(df: DataFrame, srcCol: String, textCol: String,
                        temperature: Double): Map[String, Double] = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val totals = sourceTokenTotals(df, srcCol, textCol).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val mass = totals.values.map(_.toDouble).sum
    // all-zero-token corpus: 0/0 would silently yield NaN shares that
    // propagate into every downstream rate — no mass means no mixture
    require(totals.isEmpty || mass > 0,
      s"temperatureShares: corpus has zero tokens across ${totals.size} sources — no mass to scale")
    val raw = totals.map { case (src, toks) =>
      src -> math.pow(toks.toDouble / mass, 1.0 / temperature)
    }
    val z = raw.values.sum
    raw.map { case (src, w) => src -> w / z }
  }

  /** The mixture filter: corpus rows from shared sources kept at their
    * computed rate, everything else dropped. */
  def mixToBudget(df: DataFrame, idCol: String, srcCol: String, textCol: String,
                  shares: Map[String, Double], budgetTokens: Long): DataFrame = {
    val rates = mixRates(df, srcCol, textCol, shares, budgetTokens).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toDF(srcCol, "__keep_rate")
    df.join(broadcast(ratesDf), Seq(srcCol))
      .where(Sampling.hashUniform(col(idCol)) < col("__keep_rate"))
      .drop("__keep_rate")
  }

  /**
   * Per-source epoch expansion — repetition factors applied as rows (the
   * LLaMA-recipe mixture: some sources repeat 2+ epochs, some fractional).
   * Epochs are RATIONAL (`num/den`) so the expansion is integer-exact:
   * every doc gets `num div den` copies, plus one more iff
   * `md5_32(id) mod den < num mod den` — deterministic, rerun-stable,
   * engine-portable (same md5-residue family as [[Sampling.hashUniform]]),
   * and the per-source expected copy count is exactly num/den. Sources
   * absent from the map keep one epoch.
   *
   * Output: one row per (doc, epoch_idx), epoch_idx in [0, n) — downstream
   * sharding treats copies as independent training docs.
   *
   * Scale shape: the epoch map compiles to a literal when-chain (sources
   * are few), the residue and `explode(sequence(...))` are scan-local — no
   * shuffle, no join; output size is exactly the epoch-weighted corpus a
   * data loader would consume.
   */
  def epochExpand(df: DataFrame, idCol: String, srcCol: String,
                  epochs: Map[String, (Int, Int)]): DataFrame = {
    epochs.foreach { case (s, (n, d)) =>
      require(n >= 0 && d >= 1, s"epochs for '$s' must be n>=0, d>=1 (got $n/$d)")
    }
    val numC = epochs.foldLeft(lit(1)) { case (acc, (s, (n, _))) =>
      when(col(srcCol) === s, lit(n)).otherwise(acc) }.cast("long")
    val denC = epochs.foldLeft(lit(1)) { case (acc, (s, (_, d))) =>
      when(col(srcCol) === s, lit(d)).otherwise(acc) }.cast("long")
    val h32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    // SQL `div` (integral divide) throughout — "integer-exact" should hold
    // by construction, not by a double-rounding argument
    df.withColumn("__num", numC).withColumn("__den", denC)
      .withColumn("__n_copies", (expr("__num div __den") +
        when(pmod(h32, col("__den")) < col("__num") % col("__den"), 1L)
          .otherwise(0L)).cast("int"))
      .where(col("__n_copies") > 0)
      .withColumn("epoch_idx", explode(sequence(lit(0), col("__n_copies") - 1)))
      .drop("__num", "__den", "__n_copies")
  }
}
