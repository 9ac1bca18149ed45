package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. */
final case class MediaRow(
    media_id: Long,
    mime: String,
    media: Array[Byte])

/** Decoded features for one media item. */
final case class MediaFeatures(
    media_id: Long,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    histogram: Array[Double])

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns
 * with typed metadata, processed in per-partition batches.
 *
 * The Spark-side shape is real and tested — schema, partition-parallel
 * batch processing (mapPartitions over Dataset[MediaRow], the Scala analog
 * of mapInPandas batches), feature schema — while the codec itself is a
 * clearly-marked deterministic STUB: the image/audio libraries are not in
 * this container. Swap [[decodeStub]]'s body for a real decoder (JNI/ffmpeg/
 * ImageIO) without touching the pipeline shape.
 */
object Multimodal {

  /** STUB decode: deterministic fake "decoder". Real implementation would
    * decode pixels/samples; this derives stable pseudo-dimensions and a
    * 16-bin byte histogram so downstream plumbing is exercised honestly. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = if (row.media == null) Array.emptyByteArray else row.media
    val h = graft.json.Hashes.murmur3_32(bytes)
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    val total = math.max(1, bytes.length)
    MediaFeatures(
      media_id = row.media_id,
      mime = row.mime,
      n_bytes = bytes.length,
      width = 16 + (math.abs(h) % 1024),        // STUB: pretend-decoded dims
      height = 16 + (math.abs(h >> 10) % 1024), // STUB
      histogram = hist.map(_ / total))
  }

  /** Partition-parallel feature extraction: batches flow through the stub
    * codec without ever collecting to the driver. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** "Resize" stub: a metadata-level operation (target dims recorded; a real
    * impl would re-encode the payload). */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    val f = features.toDF()
    val scale = least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    f.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling stub for video-like payloads: every nth chunk index. */
  def frameSample(media: Dataset[MediaRow], chunkBytes: Int, everyN: Int): DataFrame = {
    val df = media.toDF()
    val nChunks = ceil(length(col("media")).cast("double") / chunkBytes).cast("int")
    df.select(col("media_id"), col("mime"),
        explode(when(nChunks > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))).as("chunk"))
      .where(pmod(col("chunk"), lit(everyN)) === 0)
  }

  /** Fixture builder: wrap a text column as fake binary media (UTF-8 bytes),
    * so the pipeline runs on the driver-provided documents table. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[MediaRow]
  }
}
