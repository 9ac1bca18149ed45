package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided testdata tables (TESTDATA.md).
  * `events.parquet` stores ts as TIMESTAMP(NANOS), which Spark's vectorized
  * parquet reader rejects by default — read it as long nanos and normalize
  * to a microsecond TimestampType column plus an exact epoch-millis column. */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` normalized to TimestampType (micros) and `ts_ms` epoch
    * millis. Conversions use exact integral division (`div`), NOT `/`: the
    * nanos exceed 2^53, so the double division `/` performs can round a
    * value like …723999963 ns UP across a unit boundary (→ …724 ms) where
    * truncating semantics (and DuckDB's nanos→micros→millis reads) give
    * …723 — an off-by-one that surfaced as a 1 ms session-duration
    * mismatch. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
