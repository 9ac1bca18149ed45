package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: attach to each left row the LATEST right row of the same key
 * whose timestamp is <= the left row's (ties: right row first, so an
 * equal-timestamp right row matches), optionally bounded by a lookback
 * horizon. The canonical "attribute each purchase to the last prior click" /
 * "price a trade at the last quote" operator, which Spark has no built-in
 * for.
 *
 * NOT implemented as a join: a range/as-of join written as
 * `left.join(right, key && rightTs <= leftTs)` explodes to every
 * (left, earlier-right) pair before aggregation — quadratic per key.
 * Instead both sides are unioned with a side tag and the match columns are
 * carried forward by an ordered per-key window (`last(_, ignoreNulls)`),
 * so the cost is ONE hash shuffle on the key plus an entity-local sort —
 * linear, no row explosion, the same scale shape as
 * [[graft.streaming.Sessions.sessionize]]. Per-key volumes bound each
 * window task; for a pathological hot key, pre-split by coarse time bucket
 * (carrying the last match of the previous bucket forward) the same way
 * the sessionize docs describe.
 */
object AsofJoin {

  /**
   * @param left      probe side; all its columns survive
   * @param right     build side; only `keyCol`, `tsCol`, `tieCol` and
   *                  `matchCols` are read
   * @param matchCols right columns to attach, emitted as `asof_<name>`
   *                  (null when no right row precedes the left row);
   *                  `asof_ts` carries the matched right timestamp
   * @param horizon   max lookback in `tsCol` units; matches further back
   *                  are nulled (Long.MaxValue = unbounded)
   *
   * `tsCol`+`tieCol` must order each side totally per key; `tieCol` breaks
   * equal-timestamp ties within a side (right rows always sort before left
   * rows at the same timestamp — inclusive <= semantics).
   */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           tieCol: String, matchCols: Seq[String],
           horizon: Long = Long.MaxValue): DataFrame = {
    require(matchCols.nonEmpty, "matchCols must name at least one column")
    val leftCols = left.columns.toSeq
    val asofCols = matchCols.map("asof_" + _)

    // unified schema: left payload (null on right rows) + prefixed match
    // payload (null on left rows) + side tag
    val l2 = asofCols.zip(matchCols).foldLeft(left.withColumn("_side", lit(1))) {
      case (df, (ac, mc)) => df.withColumn(ac, lit(null).cast(right.schema(mc).dataType))
    }
    val r2base = right.select(
      (Seq(col(keyCol), col(tsCol), col(tieCol)) ++
        matchCols.map(c => col(c).as("asof_" + c))): _*)
      .withColumn("_side", lit(0))
    val r2 = leftCols.filterNot(Set(keyCol, tsCol, tieCol)).foldLeft(r2base) {
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l2.select((leftCols ++ Seq("_side") ++ asofCols).map(col): _*)
      .unionByName(r2.select((leftCols ++ Seq("_side") ++ asofCols).map(col): _*))

    val order = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct, so every asof_* output comes from the SAME
    // (latest) right row even when some of its match columns are null
    val payload = struct(
      (col(tsCol).as("ts") +: asofCols.map(ac => col(ac).as(ac))): _*)
    val carried = unioned.withColumn("_m",
      last(when(col("_side") === 0, payload), ignoreNulls = true).over(order))
    val horizonOk = col("_m").isNotNull &&
      (col(tsCol) - col("_m.ts") <= horizon)
    val out = asofCols.foldLeft(
      carried.withColumn("asof_ts", when(horizonOk, col("_m.ts")))) {
      case (df, ac) => df.withColumn(ac, when(horizonOk, col("_m." + ac)))
    }
    out.where(col("_side") === 1).drop("_side", "_m")
  }
}
