package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided testdata tables (TESTDATA.md).
  * `events.parquet` has shipped `ts` as TIMESTAMP(NANOS) in some rounds
  * (which Spark's vectorized parquet reader rejects by default — read as
  * long nanos) and as naive TIMESTAMP(MICROS) in others; normalize both to
  * a TimestampType column plus an exact epoch-millis column so downstream
  * operators are encoding-agnostic. */
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
    // nanos variant: read TIMESTAMP(NANOS) as raw long nanos
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // micros variant: read naive TIMESTAMP(MICROS) as TimestampType (the raw
    // micros ARE the UTC instant — no session-timezone reinterpretation,
    // matching DuckDB's epoch_ns(ts) view of the same file)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = read(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TimestampType micros; unix_micros is timezone-free
        raw.withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
    }
  }
}
