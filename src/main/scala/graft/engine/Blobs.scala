package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Blob store surface (SURVEY §2.1: BlobStore.java:80-106): binary payloads
 * with metadata and ranged reads, mapped onto Spark's binaryFile source —
 * metadata scans never load payload bytes (the source prunes the content
 * column), and ranged gets slice the binary column.
 */
object Blobs {

  /** Metadata scan: (path, modificationTime, length) without reading bytes. */
  def scanMetadata(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("modificationTime"), col("length"))

  /** Full read including payload. */
  def read(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Ranged get: byte range [offset, offset+len) of each blob (1-based
    * substr on binary, like the reference's ranged GET). */
  def ranged(blobs: DataFrame, offset: Int, len: Int): DataFrame =
    blobs.withColumn("range", substring(col("content"), offset + 1, len))
      .select(col("path"), col("length"), col("range"))
}
