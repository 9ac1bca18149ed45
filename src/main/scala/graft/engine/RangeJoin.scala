package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: match point rows to same-key interval rows with
 * `start <= ts <= end`. Spark has no native range-join strategy — written
 * as `points.join(intervals, key && ts.between(start, end))` it plans a
 * per-key nested loop (every point × every interval of the key), quadratic
 * on hot keys.
 *
 * Implemented instead as the standard time-bucket decomposition: intervals
 * explode to the buckets they cover (`start div W .. end div W`), points
 * map to their single bucket (`ts div W`), the two sides equi-join on
 * (key, bucket) and the exact `between` predicate filters the bucket-level
 * candidates. ONE shuffle pair on a composite key Catalyst can hash — and
 * because a point owns exactly one bucket, each (point, interval) pair
 * appears at most once: no post-join dedup.
 *
 * Pick `bucketWidth` near the typical interval width: explosion factor is
 * `interval/W + 1` buckets per interval, while candidate pressure per
 * bucket grows with `W`. Output size is the true match count — the join is
 * only as big as its answer plus the bucket-candidate false positives
 * (bounded by intervals-overlapping-the-bucket, not by per-key row
 * counts).
 */
object RangeJoin {

  /**
   * Inner-join points to the intervals containing them.
   *
   * @param points     rows with `keyCol` and `tsCol`
   * @param intervals  rows with `keyCol`, `startCol`, `endCol` (inclusive
   *                   bounds, same units as `tsCol`); other columns pass
   *                   through — names must not collide with the point
   *                   side's (alias before calling)
   * @param bucketWidth bucket size in `tsCol` units (> 0)
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
                      tsCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"column collision between sides: ${overlap.mkString(", ")} — alias first")
    // integral `div` (exact; `/` would round huge longs through a double).
    // Truncation is monotone, and both sides truncate identically, so an
    // interval's bucket span always covers every contained point's bucket.
    val p = points.withColumn("_bucket",
      expr(s"cast(`$tsCol` as bigint) div $bucketWidth"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(
        expr(s"cast(`$startCol` as bigint) div $bucketWidth"),
        expr(s"cast(`$endCol` as bigint) div $bucketWidth"))))
    p.join(i, Seq(keyCol, "_bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /**
   * Interval-overlap join: all same-key pairs whose CLOSED intervals
   * intersect (`lStart <= rEnd && rStart <= lEnd`) — schedule conflicts,
   * session-vs-outage attribution, span containment.
   *
   * Same bucket decomposition as [[pointInInterval]], with BOTH sides
   * exploded to their covered buckets. A pair sharing k buckets would
   * surface k times from the equi-join, so each pair is claimed by exactly
   * one bucket — the one containing the overlap's start `max(lStart,
   * rStart)` (truncation is monotone, so that bucket is `max(lStart div W,
   * rStart div W)`, always among the shared buckets): no post-join
   * distinct, which would shuffle the matched payload a second time.
   */
  def intervalOverlap(left: DataFrame, right: DataFrame, keyCol: String,
                      lStartCol: String, lEndCol: String,
                      rStartCol: String, rEndCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"column collision between sides: ${overlap.mkString(", ")} — alias first")
    def buckets(df: DataFrame, s: String, e: String) =
      df.withColumn("_bucket", explode(sequence(
        expr(s"cast(`$s` as bigint) div $bucketWidth"),
        expr(s"cast(`$e` as bigint) div $bucketWidth"))))
    buckets(left, lStartCol, lEndCol)
      .join(buckets(right, rStartCol, rEndCol), Seq(keyCol, "_bucket"))
      .where(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
        col("_bucket") === greatest(
          expr(s"cast(`$lStartCol` as bigint) div $bucketWidth"),
          expr(s"cast(`$rStartCol` as bigint) div $bucketWidth")))
      .drop("_bucket")
  }
}
