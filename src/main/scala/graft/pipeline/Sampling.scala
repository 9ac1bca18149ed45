package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling and splitting for training-data pipelines.
 *
 * Everything is keyed on a cryptographic hash of a stable id — no RNG, no
 * seed plumbing, rerun-stable and join-stable across engines (md5 hex is
 * identical in Spark and SQL engines, so splits are reproducible outside
 * Spark too). Thresholds compare the first hex chars lexically: a fraction
 * f maps to the hex prefix round(f * 16^k) at width k, giving granularity
 * 1/16^k (k=4 → 0.0015%).
 */
object Sampling {

  private val PrefixLen = 4

  /** Hex threshold for a fraction in [0,1] at PrefixLen granularity. */
  private[pipeline] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val buckets = 1 << (4 * PrefixLen) // 16^PrefixLen
    val cut = math.round(fraction * buckets).toInt
    if (cut >= buckets) "g" * PrefixLen // 'g' sorts above every hex digit
    else f"$cut%04x"
  }

  private def hashPrefix(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, PrefixLen)

  /** Deterministic keep-fraction filter (the sample is a stable subset:
    * re-running, or sampling a superset, reproduces it). */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(hashPrefix(col(keyCol)) < lit(hexThreshold(fraction)))

  /** Label each row train/eval by hash threshold — the reproducible
    * train-test split (disjoint, exhaustive, rerun-stable). */
  def splitColumn(keyCol: Column, trainFraction: Double): Column =
    when(hashPrefix(keyCol) < lit(hexThreshold(trainFraction)), "train")
      .otherwise("eval")

  /** Content-keyed split: hashes the NORMALIZED TEXT rather than the id,
    * so exact duplicates land on the same side regardless of what ids
    * they carry — the leak-safe default for corpora that may contain
    * copies (an id-keyed split lets a duplicated document straddle
    * train/eval and leak). Scan-local, no shuffle. */
  def contentSplitColumn(textCol: Column, trainFraction: Double): Column =
    splitColumn(lower(trim(textCol)), trainFraction)

  /** Near-duplicate-safe split: every connected duplicate cluster over
    * `pairs` (id1/id2 edges — minhash/simhash candidates; include exact-dup
    * edges too, or an exact copy missing from `pairs` can still straddle)
    * co-travels, keyed by its cluster label from
    * [[Dedup.duplicateClusters]]; rows outside any cluster fall back to
    * the content key. The label join is corpus-by-cluster-table — AQE
    * broadcasts the (near-dup-sized, ~% of corpus) label side when small
    * and shuffles co-keyed otherwise; nothing collects at the driver
    * beyond duplicateClusters' own bounded fast path. */
  def leakSafeSplit(df: DataFrame, idCol: String, textCol: String,
                    pairs: DataFrame, trainFraction: Double): DataFrame = {
    val labels = Dedup.duplicateClusters(pairs)
      .withColumnRenamed("id", idCol)
    df.join(labels, Seq(idCol), "left")
      .withColumn("split",
        when(col("cluster_id").isNotNull,
          splitColumn(col("cluster_id"), trainFraction))
          .otherwise(contentSplitColumn(col(textCol), trainFraction)))
      .drop("cluster_id")
  }

  def trainEvalSplit(df: DataFrame, keyCol: String,
                     trainFraction: Double): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("__split", splitColumn(col(keyCol), trainFraction))
    (tagged.where(col("__split") === "train").drop("__split"),
     tagged.where(col("__split") === "eval").drop("__split"))
  }

  /** Per-stratum deterministic sampling: each stratum keeps its own
    * fraction (class-balance control without a shuffle — the filter is a
    * scan-local predicate on (stratum, hash)). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val pred = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum &&
        hashPrefix(col(keyCol)) < lit(hexThreshold(f)))
    }
    df.where(pred)
  }

  /** Deterministic uniform in [0, 1) from the key's md5 (8 hex chars /
    * 16^8) — the engine-portable RNG behind weighted sampling: identical
    * in any engine that can parse hex, so a sample drawn here reproduces
    * in SQL byte-for-byte. */
  def hashUniform(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** [[hashUniform]] shifted to the OPEN interval (0, 1) — safe under
    * log/log-log transforms (Gumbel keys) that blow up at the endpoints. */
  def hashUniformOpen(keyCol: Column): Column =
    (conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0

  /** Weighted deterministic sampling: keep a row iff hashUniform(key) <
    * weight — rows with weight 1.0 always survive, weight 0.25 survives a
    * quarter of the time, rerun-stable and join-stable. The quality-
    * weighted downsampling stage (keep good docs preferentially) without
    * an RNG, a shuffle, or a second pass. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column): DataFrame =
    df.where(hashUniform(col(keyCol)) < weightCol)

  /** At most `n` rows per group, chosen uniformly-at-"random" within the
    * group by md5 order (rerun-stable, engine-portable) — the per-domain
    * cap that stops a giant domain from dominating a mixed corpus where
    * a global rate can't (rates starve small domains; caps bound big
    * ones). Selection ranks ascending md5-uniform with the key as the
    * pinned tie-break, through the bounded-heap top-k — no group ever
    * sorts more than its per-partition survivors, so a group with a
    * billion rows costs the same shuffle as one with a hundred. Adds a
    * `rank` column (1..n within each group). */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    val scored = df.withColumn("__neg_u", -hashUniform(col(keyCol)))
    Similarity.rankTopKPerQuery(scored, groupCol, "__neg_u", keyCol, n)
      .drop("__neg_u")
  }
}
