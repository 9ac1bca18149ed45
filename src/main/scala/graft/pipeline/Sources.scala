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

  // ------------------------------------------------------------ JSONL I/O

  /**
   * JSONL (newline-delimited JSON) corpus ingest — the interchange format
   * LLM datasets actually ship in (one JSON object per line, usually
   * .jsonl.gz). Reads with an EXPLICIT schema (never schema inference,
   * which is a second full pass over 100 TB) in PERMISSIVE mode: malformed
   * lines land in `_corrupt` instead of failing the job or silently
   * disappearing, so a crawl with a bad shard is quarantined, not lost.
   *
   * Scale shape: plain `spark.read.json` — splittable for uncompressed
   * files, one task per file for .gz (gzip is not splittable: ship many
   * medium files, not one giant one — same rule the Stash export follows).
   */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The clean rows of [[readJsonl]] (corrupt column dropped). */
  def readJsonlClean(spark: org.apache.spark.sql.SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    readJsonl(spark, path, schema).where(col("_corrupt").isNull).drop("_corrupt")

  /** The quarantine side: raw text of lines that failed to parse. Spark
    * refuses a query referencing ONLY the corrupt-record column of a raw
    * JSON scan (the parser would need the raw line it just threw away), so
    * the parsed frame is cached first — Spark's own documented recipe. */
  def corruptLines(spark: org.apache.spark.sql.SparkSession, path: String,
                   schema: org.apache.spark.sql.types.StructType): DataFrame =
    readJsonl(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .where(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"))

  /** Write a corpus as gzip JSONL shards (the export format LLM toolchains
    * consume); `shards` bounds file count so downstream gzip readers get
    * parallelism. */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").option("compression", "gzip").json(path)
  }
}
