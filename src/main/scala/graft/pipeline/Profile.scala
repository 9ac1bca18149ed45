package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * ANALYZE: per-column table profiling in ONE aggregate pass — the stats
 * collection every 100 TB deployment runs nightly to drive planning
 * decisions (broadcast-vs-shuffle thresholds, skew candidates, partition
 * sizing) and data-quality monitors (null-rate regressions, cardinality
 * drift between corpus snapshots — pairs with the snapshot-diff and
 * gram-drift reports).
 *
 * Shape: every statistic is map-side combinable (count / min / max /
 * [[Kmv]] NDV sketch), so the whole profile is a single scan + a
 * parameter-sized aggregate row regardless of table width × rows; the
 * wide row is then unpivoted driver-side (it IS parameter-sized — one
 * row) into the long (column, stat...) report. No per-column passes, no
 * exact count-distinct shuffles: NDV is the KMV estimate, EXACT below
 * the sketch capacity (the oracle regime), ±~1/√k relative above.
 *
 * min/max are reported as strings so one report schema covers every
 * column type; NUMERIC columns compare numerically BEFORE the cast
 * (min(col) then cast, never min(cast)). Non-(int/long/string) columns
 * hash into the NDV sketch via their canonical string form.
 */
object Profile {

  /** Long-format profile: one row per requested column with
    * (column, n_rows, n_nulls, ndv, min_value, max_value). */
  def analyze(df: DataFrame, cols: Seq[String], ndvK: Int = 65536): DataFrame = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no column $c"))

    def ndvInput(c: String): Column = schema(c).dataType match {
      case LongType | IntegerType | StringType => col(c)
      case _ => col(c).cast(StringType)
    }

    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        Kmv.distinctCount(ndvInput(c), ndvK).as(s"__ndv_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))

    val out = cols.map { c =>
      (c, n, n - row.getLong(row.fieldIndex(s"__nn_$c")),
        row.getLong(row.fieldIndex(s"__ndv_$c")),
        row.getAs[String](s"__min_$c"), row.getAs[String](s"__max_$c"))
    }
    df.sparkSession.createDataFrame(out)
      .toDF("column", "n_rows", "n_nulls", "ndv", "min_value", "max_value")
  }
}
