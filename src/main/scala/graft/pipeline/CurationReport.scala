package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explainable curation verdicts: per-document reject reasons rather than a
 * bare boolean — the audit artifact a production filtering pipeline emits
 * so corpus composition changes can be attributed to specific gates (and
 * gates can be tuned without re-running the world).
 *
 * Scan-local column expressions; one pass per gate, no shuffle.
 */
object CurationReport {

  /** Sorted array of failed-gate tags (empty = accepted). Gates:
    * "quality" (length/token-shape), "repetition" (Gopher signals),
    * "pii" (redactable spans present). */
  def rejectReasons(textCol: Column): Column =
    array_sort(filter(array(
      when(!TextAnalysis.qualityOk(textCol), lit("quality")),
      when(!TextAnalysis.repetitionOk(textCol), lit("repetition")),
      when(!TextClean.piiFree(textCol), lit("pii"))
    ), x => x.isNotNull))

  /** Adds reject_reasons + accepted columns. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val withReasons = df.withColumn("reject_reasons", rejectReasons(col(textCol)))
    withReasons.withColumn("accepted", size(col("reject_reasons")) === 0)
  }

  /** Corpus-level gate attribution: how many docs each reason rejects
    * (docs can carry several reasons; "accepted" counts clean docs). */
  def reasonCounts(df: DataFrame, textCol: String): DataFrame =
    annotate(df, textCol)
      .select(explode(concat(col("reject_reasons"),
        when(col("accepted"), array(lit("accepted"))).otherwise(array().cast("array<string>"))))
        .as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n_docs"))
}
