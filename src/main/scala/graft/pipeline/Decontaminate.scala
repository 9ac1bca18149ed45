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

  /** Corpus minus contaminated documents (left-anti against the flagged
    * id set — the write side of a decontamination job). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13, minHits: Int = 1): DataFrame = {
    val bad = contaminatedIds(corpus, idCol, textCol, evalSet, evalTextCol, n, minHits)
      .select(col("contaminated_id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
