package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental dedup: curate a NEW batch of documents against an already-
 * curated store without re-processing the store — the daily-crawl shape
 * (the full-corpus operators in [[Dedup]] are the bootstrap; these are
 * the steady state). The store persists FINGERPRINTS, never text:
 *
 *  - exact: md5 text hashes ([[exactFingerprints]], one narrow column);
 *  - near-dup: MinHash signatures ([[minhashStore]], k longs per doc) —
 *    band keys derive from the signature at match time, so the store
 *    needs no band table, and verification uses the standard signature
 *    estimator (matching slots / k, error ~ 1/sqrt(k)) because the
 *    store's shingle sets are gone by design.
 *
 * Scale shape: every operation is keyed by hash/band — the increment
 * (small) shuffles against the store's fingerprints; no text ever joins,
 * and the store side is one narrow scan. Oversized store buckets
 * (template spam accumulated over many increments) are capped exactly as
 * in [[Dedup.minhashNearDuplicates]].
 */
object Incremental {

  /** The exact-dedup fingerprint store of a curated corpus: distinct md5
    * text hashes. Persist this (one narrow column) between runs. */
  def exactFingerprints(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash")).distinct()

  /**
   * New docs that survive exact dedup against the store AND within the
   * batch (min id wins intra-batch, store always wins cross-batch).
   */
  def incrementalExact(newDocs: DataFrame, idCol: String, textCol: String,
                       fingerprints: DataFrame): DataFrame = {
    val intra = Dedup.dropExactDuplicates(newDocs, textCol, idCol)
    intra.join(fingerprints,
      md5(intra(textCol)) === fingerprints("text_hash"), "left_anti")
  }

  /** The near-dup fingerprint store: (id, sig) MinHash signatures — k
    * longs per doc, the single table a steady-state dedup pipeline
    * persists and appends accepted increments to. */
  def minhashStore(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 32): DataFrame =
    df.select(col(idCol).as("id"),
      sketches.minhash(col(textCol), shingleN, k).as("sig"))

  /** Signature-estimator Jaccard: fraction of matching MinHash slots. */
  def sigJaccardEstimate(sig1: Column, sig2: Column): Column =
    aggregate(zip_with(sig1, sig2, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sig1)

  /**
   * Near-duplicate hits of a new batch against a signature store:
   * (new_id, store_id, est_jaccard) for every banded candidate whose
   * signature estimate clears `threshold`. Band keys derive from the
   * signatures on BOTH sides (no band table persisted); store-side
   * buckets larger than `maxBucketSize` are dropped from candidate
   * generation, same rationale as the batch operator.
   */
  def incrementalNearDupHits(newDocs: DataFrame, idCol: String, textCol: String,
                             store: DataFrame, shingleN: Int = 3, k: Int = 32,
                             bands: Int = 8, threshold: Double = 0.5,
                             maxBucketSize: Int = 1000): DataFrame = {
    // same invariant Dedup.minhashNearDuplicates enforces: bands > k would
    // make rowsPerBand 0 (every doc in one degenerate bucket that the size
    // cap then drops — ZERO hits, silently admitting every near-dup), and a
    // non-dividing bands silently ignores k % bands signature slots
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands must divide k (got k=$k, bands=$bands)")
    val rowsPerBand = k / bands
    // a store built with a different k can never match honestly: zip_with
    // pads the shorter signature with nulls, which count as non-matching
    // slots, so the estimate silently DEFLATES and near-dups get admitted
    // — the same silent-degradation trap segmentHashStore guards against
    // with its recorded seg_size; fail loud here too (3 probe rows, the
    // store signature length is constant by construction)
    store.select(size(col("sig")).as("store_k")).limit(3).collect().foreach { r =>
      require(r.getInt(0) == k,
        s"store signatures have k=${r.getInt(0)}, query uses k=$k")
    }
    // both signature tables feed two consumers each (band join + the
    // estimator join); persist them so the k-permutation MinHash and the
    // store scan run once — session-cached on purpose, see the Dedup band
    // table for the policy
    val newSigs = minhashStore(newDocs, idCol, textCol, shingleN, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val storeSigs = store
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBands = Dedup.minhashBands(newSigs, "id", "sig", bands, rowsPerBand)
      .withColumnRenamed("id", "new_id")
    val storeBands = Dedup.minhashBands(storeSigs, "id", "sig", bands, rowsPerBand)
      .withColumnRenamed("id", "store_id")
    val okBuckets = storeBands.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n")).where(col("n") <= maxBucketSize)
      .select("band", "band_hash")
    val candidates = newBands
      .join(storeBands.join(okBuckets, Seq("band", "band_hash"), "left_semi"),
        Seq("band", "band_hash"))
      .select("new_id", "store_id").distinct()
    candidates
      .join(newSigs.select(col("id").as("new_id"), col("sig").as("sig_n")), "new_id")
      .join(storeSigs.select(col("id").as("store_id"), col("sig").as("sig_s")), "store_id")
      .withColumn("est_jaccard", sigJaccardEstimate(col("sig_n"), col("sig_s")))
      .where(col("est_jaccard") >= threshold)
      .select("new_id", "store_id", "est_jaccard")
  }

  /** New docs minus near-dup hits against the store (composes with
    * [[incrementalExact]]; run exact first — it is cheaper). */
  def incrementalNearDup(newDocs: DataFrame, idCol: String, textCol: String,
                         store: DataFrame, shingleN: Int = 3, k: Int = 32,
                         bands: Int = 8, threshold: Double = 0.5,
                         maxBucketSize: Int = 1000): DataFrame = {
    val hits = incrementalNearDupHits(newDocs, idCol, textCol, store,
      shingleN, k, bands, threshold, maxBucketSize)
      .select(col("new_id").as(idCol)).distinct()
    newDocs.join(hits, Seq(idCol), "left_anti")
  }

  /** The segment-level (CCNet line-dedup) store: distinct window hashes of
    * the curated corpus plus the `seg_size` they were computed with —
    * a hash from a different window size never matches, so without the
    * recorded size a mismatched rewrite would silently dedup nothing;
    * [[incrementalSegDedup]] turns that into a loud failure instead.
    * Append each accepted increment's hashes between runs. */
  def segmentHashStore(df: DataFrame, idCol: String, textCol: String,
                       segSize: Int = 5): DataFrame =
    Lines.segmentHashes(df, idCol, textCol, segSize)
      .select("seg_hash").distinct()
      .withColumn("seg_size", lit(segSize))

  /**
   * Segment-dedup a NEW batch against the store AND within itself: a
   * window is dropped when its hash is in `store` (it already exists in
   * the curated corpus) or when it appears in >= `minDocs` distinct
   * batch documents (fresh cross-doc boilerplate arriving together).
   * Same output contract as [[Lines.dedupSegments]] (n_segs, n_dropped,
   * clean_text).
   *
   * Scale shape: the batch's (id, seg_idx, seg_hash) table persists once
   * and feeds both discovery rules; the store side is a narrow
   * hash-keyed scan into a semi-join — batch text never shuffles, and
   * the store is never re-read per document.
   */
  def incrementalSegDedup(newDocs: DataFrame, idCol: String, textCol: String,
                          store: DataFrame, segSize: Int = 5,
                          minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // the store feeds two consumers — the seg-size probe just below (a
    // plan-time action) and the condemned-set union at action time — so
    // persist it FIRST: without this the whole store lineage (typically a
    // segmentHashStore distinct over the curated corpus) runs twice per
    // call (session-cached, see the Dedup band table policy)
    val storeP = store
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a store built at a different window size can never match — fail loud
    // instead of silently degrading to intra-batch-only dedup. On that
    // failure path (or any probe error) release the persist immediately:
    // nothing will ever consume it and the caller has no handle to it
    if (storeP.columns.contains("seg_size")) {
      try {
        val sizes = storeP.select("seg_size").distinct().limit(3).collect()
        sizes.foreach { r =>
          require(r.getInt(0) == segSize,
            s"store was built with segSize=${r.getInt(0)}, rewrite uses $segSize")
        }
      } catch { case t: Throwable => storeP.unpersist(); throw t }
    }
    val segs = Lines.segmentHashes(newDocs, idCol, textCol, segSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached, see Dedup band table
    val inBatch = segs.groupBy("seg_hash")
      .agg(countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("seg_hash")
    val condemned = storeP.select(col("seg_hash")).unionByName(inBatch).distinct()
    Lines.rebuildWithoutSegments(newDocs, idCol, textCol, segSize, condemned, segs)
  }

  /**
   * Snapshot diff between two corpus versions — the release-note artifact
   * of a recurring curation run ("vs last month: +N docs, -M docs, K
   * rewritten"). Classifies every id present in either snapshot:
   *
   *   added      in `newDf` only
   *   removed    in `oldDf` only
   *   modified   in both, text hash differs
   *   unchanged  in both, text hash equal
   *
   * Output: (idCol, change), one row per id in the union.
   *
   * Scale shape: both sides reduce to (id, md5) scan-locally — text never
   * shuffles — then one full outer join keyed by id decides the class.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // presence is tracked by explicit flags, not hash nullness: a row whose
    // TEXT is null (e.g. a JSONL line missing the field) still EXISTS in
    // its snapshot, and md5(null) = null must not reclassify it
    val o = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("old_hash"),
      lit(true).as("in_old"))
    val n = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("new_hash"),
      lit(true).as("in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("old_hash") <=> col("new_hash"), "unchanged")
          .otherwise("modified").as("change"))
  }
}
