package graft.engine

import graft.resolve.DocRow
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/**
 * Stash: the batch-export interface (SURVEY §2.1, §3.3) — a full placement
 * scan of resolved documents written as gzipped JSON, partitioned per table,
 * with `_SUCCESS` (native) and `_LATEST` pointer markers, plus read-back.
 *
 * The reference's whole distributed scanner subsystem (ScanUploader +
 * DistributedScanRangeMonitor + LocalRangeScanUploader, ~2k LoC) collapses
 * to a partitioned DataFrame write here: splits ARE files; downstream
 * parallel consumption is the file listing.
 */
object Stash {

  /** Stash directory names are UTC timestamps (StashUtil.java
    * STASH_DIRECTORY_DATE_FORMAT). */
  val ScanIdFormat: java.time.format.DateTimeFormatter =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss")
      .withZone(java.time.ZoneOffset.UTC)

  // ------------------------------------------------------------- fs plumbing
  // All marker/listing I/O goes through the Hadoop FileSystem API (same as
  // DocStore), never java.nio/java.io: the data itself is written via
  // Hadoop-FS paths, so a stash root on hdfs://, s3a://, or any object
  // store must resolve its markers through the SAME abstraction or the
  // _SUCCESS/_LATEST files land on (or fail against) the local disk.

  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(hadoopConf()), p)
  }

  private def writeUtf8(path: String, content: String): Unit = {
    val (fs, p) = fsFor(path)
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readUtf8(path: String): String = {
    val (fs, p) = fsFor(path)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** `:` is legal in table names but problematic in URLs/object keys;
    * since table names are lowercase, `~` substitutes without collision
    * (StashUtil.java encodeStashTable). The encoded charset [a-z0-9-._~]
    * is also inert to Spark's partition-path escaping, so the directory
    * on disk is exactly `table=<encoded>`. */
  def encodeStashTable(table: String): String = table.replace(':', '~')
  def decodeStashTable(dir: String): String = dir.replace('~', ':')

  /** Export resolved docs (tombstones excluded) as canonical content JSON
    * lines under stashRoot/<scanId>/, one directory per table. Writes the
    * reference's `_SUCCESS` payload (start time, completion time, scan id —
    * StashReaderTest.testGetStashStartTime's three lines) and the `_LATEST`
    * pointer. */
  def export(docs: Dataset[DocRow], stashRoot: String, scanId: String): String = {
    import docs.sparkSession.implicits._
    val startedAt = java.time.Instant.now()
    val outDir = s"$stashRoot/$scanId"
    val lines = docs.filter(d => !d.deleted)
      .map(d => (Stash.encodeStashTable(d.table), d.contentJson))
      .toDF("table", "json")
    lines.write
      .partitionBy("table")
      .option("compression", "gzip")
      .mode("overwrite")
      .text(outDir)
    val success = s"$startedAt\n${java.time.Instant.now()}\n$scanId"
    writeUtf8(s"$outDir/_SUCCESS", success)
    // _LATEST pointer (StashUtil.java:21-23 analog)
    writeUtf8(s"$stashRoot/_LATEST", scanId)
    outDir
  }

  /** Consistency-window export (ScanUploader.java:56-58 +
    * DataTools.java:32-76): resolve the placement AS OF `cutoffMs` and
    * export that snapshot — deltas written after the cutoff (the scan is
    * racing live producers) do not leak into the export, so every table in
    * the stash reflects the same instant. */
  def exportAsOf(changes: DataFrame, stashRoot: String, scanId: String,
                 cutoffMs: Long, placement: String = "default"): String =
    export(graft.resolve.ResolveEngine.resolveAsOf(changes, cutoffMs, placement),
      stashRoot, scanId)

  /** Differential export: only documents mutated after `sinceMs` (the
    * incremental companion to a full scan — downstream consumers overlay it
    * on the previous full export; ScanUploader's re-scan analog). */
  def exportDelta(docs: Dataset[DocRow], stashRoot: String, scanId: String,
                  sinceMs: Long): String =
    export(docs.filter(d => d.last_update_ms > sinceMs), stashRoot, scanId)

  /** Resolve the latest export directory via the _LATEST pointer. */
  def latest(spark: SparkSession, stashRoot: String): String =
    s"$stashRoot/${readUtf8(s"$stashRoot/_LATEST").trim}"

  /** Read back one table (or all tables) of an export as a JSON DataFrame.
    * Splits are files — Spark parallelizes per file natively. `table` is
    * the REAL table name; the path encoding is internal. */
  def read(spark: SparkSession, exportDir: String, table: Option[String] = None): DataFrame = {
    val path = table.map(t => s"$exportDir/table=${encodeStashTable(t)}").getOrElse(exportDir)
    spark.read.json(path)
  }

  /** List exported tables (the split listing of StandardStashReader),
    * decoded back to real table names (`table~three/` -> `table:three`). */
  def listTables(spark: SparkSession, exportDir: String): Seq[String] = {
    val (fs, p) = fsFor(exportDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("table="))
      .map(s => decodeStashTable(s.getPath.getName.stripPrefix("table="))).sorted
  }

  /** A table's splits: its data files (StashReader.getSplits:310 — a split
    * = one gzip file, consumed independently by parallel readers). */
  def getSplits(spark: SparkSession, exportDir: String, table: String): Seq[String] = {
    val (fs, p) = fsFor(s"$exportDir/table=${encodeStashTable(table)}")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** One split's rows (StashReader.getSplit analog). */
  def readSplit(spark: SparkSession, splitPath: String): DataFrame =
    spark.read.json(splitPath)

  /** Table metadata: split count + total compressed bytes
    * (StashTableMetadata analog). */
  def tableMetadata(spark: SparkSession, exportDir: String, table: String): (String, Int, Long) = {
    val splits = getSplits(spark, exportDir, table)
    val sizes = splits.map { s =>
      val (fs, p) = fsFor(s)
      fs.getFileStatus(p).getLen
    }
    (table, splits.size, sizes.sum)
  }

  /** The export's creation time, from the first line of its `_SUCCESS`
    * payload (StashUtil.getStashCreationTimeStamp). */
  def stashCreationTime(exportDir: String): java.time.Instant =
    java.time.Instant.parse(readUtf8(s"$exportDir/_SUCCESS").split('\n')(0).trim)

  /** Creation time encoded in a timestamp-format scan id
    * (StashUtil.getStashCreationTime: `2015-01-01-00-00-00` -> instant). */
  def creationTimeFromScanId(scanId: String): java.time.Instant =
    java.time.Instant.from(ScanIdFormat.parse(scanId))

  /** Scan id for a creation time (StashUtil.getStashDirectoryForCreationTime). */
  def scanIdForCreationTime(t: java.time.Instant): String = ScanIdFormat.format(t)
}

/**
 * A stateful stash reader over one stash root (StandardStashReader):
 * `getLatest` follows the `_LATEST` pointer unless `lockToLatest` pinned a
 * snapshot — the lock is how a multi-step consumer keeps every read on ONE
 * consistent export while new exports land (StashReaderTest
 * .testGetLatestCreationTime).
 */
final class StashReader(val spark: SparkSession, val stashRoot: String) {
  @volatile private var locked: Option[String] = None

  /** The current scan id: the pinned one if locked, else `_LATEST`. */
  def getLatest: String = locked.getOrElse(readLatestPointer())

  def getLatestCreationTime: java.time.Instant =
    Stash.creationTimeFromScanId(getLatest)

  /** Pin all subsequent reads to the export that is latest NOW. */
  def lockToLatest(): Unit = locked = Some(readLatestPointer())
  def unlock(): Unit = locked = None

  def latestDir: String = s"$stashRoot/$getLatest"
  def listTables(): Seq[String] = Stash.listTables(spark, latestDir)
  def readTable(table: String): DataFrame = Stash.read(spark, latestDir, Some(table))
  def getSplits(table: String): Seq[String] = Stash.getSplits(spark, latestDir, table)

  private def readLatestPointer(): String =
    Stash.latest(spark, stashRoot).stripPrefix(s"$stashRoot/")
}
