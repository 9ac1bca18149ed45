package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Source/domain-level curation: web-scale corpora are filtered not only
 * per-document but per SOURCE (domain, crawl, feed) — a source whose
 * documents are mostly low-quality is dropped wholesale (the domain-level
 * filters of public web corpora).
 *
 * Scale shape: the profile is one hash-aggregate keyed by source (#sources
 * << #docs — domains are millions where docs are billions), and the
 * keep-filter re-joins it to the corpus as a broadcast left-semi join, so
 * corpus rows never shuffle: aggregate up, broadcast the verdict back down.
 */
object Sources {

  /** Per-source quality profile: n_docs, n_quality (docs passing the
    * gate), total_tokens. `gate` defaults to the composite quality+
    * repetition acceptance used by the curation pipeline. */
  def sourceProfile(df: DataFrame, srcCol: String, textCol: String,
                    gate: Column => Column =
                      c => TextAnalysis.qualityOk(c) && TextAnalysis.repetitionOk(c)): DataFrame =
    df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(gate(col(textCol)).cast("long")).as("n_quality"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("total_tokens"))

  /** Corpus minus documents from sources whose quality rate falls below
    * `minQualityRate` (sources with fewer than `minDocs` documents are
    * kept — too few samples to condemn a source). */
  def filterBySourceQuality(df: DataFrame, srcCol: String, textCol: String,
                            minQualityRate: Double, minDocs: Long = 10L,
                            gate: Column => Column =
                              c => TextAnalysis.qualityOk(c) && TextAnalysis.repetitionOk(c)): DataFrame = {
    val keep = sourceProfile(df, srcCol, textCol, gate)
      .where(col("n_docs") < minDocs ||
        col("n_quality").cast("double") / col("n_docs") >= minQualityRate)
      .select(col(srcCol))
    df.join(broadcast(keep), Seq(srcCol), "left_semi")
  }
}
