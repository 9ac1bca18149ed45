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

  /** Distributed put: one object per row (`idCol` names the blob, `textCol`
    * is the payload, UTF-8) — the blob store put path as a partitioned
    * write, each task writing its own partition's objects (no driver
    * collect). Paths resolve through the Hadoop FileSystem API with the
    * session's configuration shipped to executors (same rule as
    * [[Stash]]'s marker I/O and [[graft.pipeline.Warc.writeWet]]), so
    * hdfs:// and s3a:// stores work unchanged; when the resolved
    * filesystem is the machine-local one the bytes go out via java.nio
    * (its native implementation — the wrapper forks a shell per
    * create/chmod where Hadoop native IO is absent). Returns the store
    * dir. */
  def putAll(docs: DataFrame, idCol: String, textCol: String, dir: String): String = {
    val sc = docs.sparkSession.sparkContext
    // serializable conf via GraftBridge (same as Warc.writeWet) so every
    // executor resolves the filesystems the driver sees
    val conf = org.apache.spark.sql.GraftBridge.serializableConf(sc.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    base.getFileSystem(sc.hadoopConfiguration).mkdirs(base)
    docs.select(col(idCol).cast("string"), col(textCol))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val base = new org.apache.hadoop.fs.Path(dir)
        base.getFileSystem(conf.value) match {
          case local: org.apache.hadoop.fs.LocalFileSystem =>
            // the resolved FS is the machine-local one, whose native
            // implementation IS java.nio — the Hadoop wrapper costs ~45x
            // per object here (without native IO each create/chmod forks a
            // shell, ~4 ms/object, plus a .crc sidecar stream per put).
            // Resolution still went through the Hadoop API, so an
            // hdfs:///s3a:// deployment takes the branch below; file://
            // scatters across executors either way — that is a property of
            // the scheme on a multi-node cluster, not of the write API.
            val dirPath = local.pathToFile(base).toPath
            // fs.create auto-creates parents on the Hadoop branch; match it
            // here — the driver-side mkdirs never ran on THIS machine for a
            // multi-node file:// deployment, and ids containing '/' need
            // their own parent chain. createDirectories is idempotent.
            java.nio.file.Files.createDirectories(dirPath)
            // nested ids ('/' in the name) need their parent chain; memoize
            // per partition so the repeated-prefix case costs one mkdir per
            // DISTINCT directory, not a stat per object (this branch exists
            // to eliminate per-object syscall overhead)
            val made = scala.collection.mutable.HashSet[java.nio.file.Path](dirPath)
            it.foreach { r =>
              val target = dirPath.resolve(r.getString(0) + ".txt")
              if (made.add(target.getParent))
                java.nio.file.Files.createDirectories(target.getParent)
              java.nio.file.Files.write(target,
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          case fs =>
            it.foreach { r =>
              val out = fs.create(
                new org.apache.hadoop.fs.Path(dir, r.getString(0) + ".txt"), true)
              try out.write(
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            }
        }
      }
    dir
  }

  /** Blob metadata digests: the reference computes MD5 and SHA-1 while
    * streaming chunks at put time and stores them in the blob's
    * StorageSummary (DefaultBlobStore.putObject — the `X-BV-Hash-*`
    * attributes). Here they are one codegen'd pass over the content. */
  def withDigests(blobs: DataFrame, contentCol: String = "content"): DataFrame =
    blobs
      .withColumn("md5", md5(col(contentCol)))
      .withColumn("sha1", sha1(col(contentCol)))
      .withColumn("n_bytes", length(col(contentCol)).cast("long"))

  /** Offset range spec (blob-api OffsetRangeSpecification): bytes
    * `[offset, offset + min(len, blobLength - offset))`. Rows whose range
    * is unsatisfiable (offset at/past end, or zero-length result) are
    * dropped — the scan analog of RangeNotSatisfiableException. */
  def rangeOffset(blobs: DataFrame, offset: Long, len: Option[Long] = None,
                  contentCol: String = "content"): DataFrame = {
    require(offset >= 0, "Range offset must be >=0")
    len.foreach(l => require(l > 0, "Range length must be >0"))
    val blobLen = length(col(contentCol)).cast("long")
    val effLen = len.map(l => least(lit(l), blobLen - offset))
      .getOrElse(blobLen - offset)
    blobs
      .withColumn("range",
        col(contentCol).substr(lit((offset + 1).toInt), effLen.cast("int")))
      .where(blobLen > offset && effLen > 0)
  }

  /** Suffix range spec (blob-api SuffixRangeSpecification): the LAST
    * `min(n, blobLength)` bytes; a zero-length suffix is always
    * unsatisfiable (the HTTP spec quirk the reference preserves). */
  def rangeSuffix(blobs: DataFrame, n: Long,
                  contentCol: String = "content"): DataFrame = {
    require(n >= 0, "Suffix length must be >= 0")
    val blobLen = length(col(contentCol)).cast("long")
    val effLen = least(lit(n), blobLen)
    blobs
      .withColumn("range",
        col(contentCol).substr(greatest(lit(1), (blobLen - n + 1).cast("int")),
          effLen.cast("int")))
      .where(effLen > 0)
  }
}
