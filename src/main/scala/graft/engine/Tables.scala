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

  /** events with `ts` normalized to TimestampType (micros) and `ts_ms` epoch millis. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, sfDir, "events")
      .withColumn("ts_ms", (col("ts") / 1000000L).cast("long"))
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }
}
