package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-space outlier detection — the quality gate that catches what
 * text heuristics can't: mojibake, binary-junk, wrong-modality and
 * contaminated documents land far from the corpus centroid in embedding
 * space even when their token statistics look ordinary.
 *
 * Two passes over the corpus, both map-side combinable, nothing
 * corpus-sized ever reaching the driver:
 *
 *   1. [[centroid]] — per-dimension mean via posexplode + keyed avg. The
 *      explode emits N×dims rows but the aggregate has only `dims`
 *      distinct keys, so partial aggregation collapses each partition to
 *      dims cells before the (tiny) shuffle; the collect is dims doubles
 *      (parameter-sized state, same budget as IVF centroids).
 *   2. distance + selection — [[distanceTo]] is a scan-local zip_with
 *      against the broadcast-literal centroid; [[topOutliers]] ranks with
 *      the shuffle-free bounded-heap top-k (≤ k rows leave any partition),
 *      and [[zscoreOutliers]] gates on a second scalar aggregate
 *      (mean/stddev of distance) — a filter, no sort at all.
 *
 * At 100 TB both shapes hold: the only shuffles are a dims-keyed aggregate
 * and (for top-k) the k×numPartitions survivor window.
 */
object Outliers {

  /** Per-dimension mean of an array column. Returns a dims-length array —
    * parameter-sized driver state by construction. Decimal accumulation
    * (same shape as Lloyd refinement in [[Similarity]]): exact and
    * associative, so the centroid — and every distance derived from it —
    * is identical under ANY partitioning; a double `avg` wobbles with
    * float summation order across hosts. decimal(38,15) gives ~1e23 of
    * integer headroom per component, so any physically plausible embedding
    * magnitude fits — a narrower precision would overflow the cast (ANSI
    * error) on components >= 1e10. */
  def centroid(df: DataFrame, vecCol: String): Array[Double] = {
    // one-pass exact aggregate (no posexplode, no N×dims shuffle): the
    // per-dimension sums accumulate in the SAME decimal(38,15) arithmetic,
    // and the sum/count division stays in Catalyst, so the means are
    // bit-identical to the posexplode + groupBy(pos) formulation this
    // replaces (see VecDimStatsAgg)
    val row = df.agg(sketches.vecDimStats(col(vecCol)).as("st"))
      .select(sketches.vecDimMeans(col("st")).as("means"))
      .head()
    require(!row.isNullAt(0), "centroid of an empty corpus")
    row.getSeq[Double](0).toArray
  }

  /** Euclidean distance from a vector column to a fixed center, summed in
    * index order (deterministic per row). The center rides as ONE array
    * literal (typedLit), not dims separate lit nodes — an element-wise
    * `array(lit,lit,…)` at 384 dims makes janino compile a thousand-node
    * expression per query (measured ~2s of fixed codegen latency). */
  def distanceTo(vecCol: Column, center: Array[Double]): Column =
    // single-pass expression, bit-identical to the zip_with/aggregate
    // formulation it replaces (per-element (v-m)² rounded and summed in
    // index order, then sqrt) — one loop per row instead of an interpreted
    // HOF chain with an intermediate array (see EuclidDistExpr)
    sketches.euclidDist(vecCol, center.toIndexedSeq)

  /** Rows with a well-formed vector of exactly `dims` elements — a null or
    * ragged embedding would make the distance null and crash the heap
    * comparator downstream; the malformed rows are a SCHEMA defect, not an
    * outlier-scoring question, so they are excluded (catch them upstream
    * with `size(vec) != dims` if they need reporting). */
  private def wellFormed(df: DataFrame, vecCol: String, dims: Int): DataFrame =
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === dims)

  /** The k most centroid-distant rows, rank 1 = farthest; ties break by id
    * asc. Null/ragged vectors are excluded (see [[wellFormed]]).
    * Output: (rank, idCol, dist). */
  def topOutliers(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val center = centroid(df, vecCol)
    val scored = wellFormed(df, vecCol, center.length)
      .select(col(idCol), distanceTo(col(vecCol), center).as("dist"))
      .withColumn("__q", lit(0))
    Similarity.rankTopKPerQuery(scored, "__q", "dist", idCol, k)
      .select(col("rank"), col(idCol), col("dist"))
  }

  /** Rows whose centroid distance exceeds `z` standard deviations above
    * the corpus mean distance — a pure filter (no sort, no top-k), for
    * gating rather than reporting. Null/ragged vectors are excluded (see
    * [[wellFormed]]). Output: (idCol, dist, zscore). */
  def zscoreOutliers(df: DataFrame, idCol: String, vecCol: String, z: Double): DataFrame = {
    val center = centroid(df, vecCol)
    val scored = wellFormed(df, vecCol, center.length)
      .select(col(idCol), distanceTo(col(vecCol), center).as("dist"))
    val stats = scored.agg(avg("dist").as("mu"), stddev_pop("dist").as("sigma")).head()
    val (mu, sigma) = (stats.getDouble(0), stats.getDouble(1))
    scored.withColumn("zscore", (col("dist") - mu) / lit(math.max(sigma, 1e-12)))
      .where(col("zscore") > z)
  }
}
