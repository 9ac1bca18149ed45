package graft.engine

import graft.resolve.DocRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

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

  /** Export resolved docs (tombstones excluded) as canonical content JSON
    * lines under stashRoot/<scanId>/, one directory per table. */
  def export(docs: Dataset[DocRow], stashRoot: String, scanId: String): String = {
    import docs.sparkSession.implicits._
    val outDir = s"$stashRoot/$scanId"
    val lines = docs.filter(d => !d.deleted)
      .map(d => (d.table, d.contentJson))
      .toDF("table", "json")
    lines.write
      .partitionBy("table")
      .option("compression", "gzip")
      .mode("overwrite")
      .text(outDir)
    // _LATEST pointer (StashUtil.java:21-23 analog)
    Files.write(Paths.get(stashRoot, "_LATEST"), scanId.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
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
  def latest(spark: SparkSession, stashRoot: String): String = {
    val id = new String(Files.readAllBytes(Paths.get(stashRoot, "_LATEST")),
      StandardCharsets.UTF_8).trim
    s"$stashRoot/$id"
  }

  /** Read back one table (or all tables) of an export as a JSON DataFrame.
    * Splits are files — Spark parallelizes per file natively. */
  def read(spark: SparkSession, exportDir: String, table: Option[String] = None): DataFrame = {
    val path = table.map(t => s"$exportDir/table=$t").getOrElse(exportDir)
    spark.read.json(path)
  }

  /** List exported tables (the split listing of StandardStashReader). */
  def listTables(spark: SparkSession, exportDir: String): Seq[String] = {
    val dir = new java.io.File(exportDir)
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("table="))
      .map(_.getName.stripPrefix("table=")).sorted
  }

  /** A table's splits: its data files (StashReader.getSplits:310 — a split
    * = one gzip file, consumed independently by parallel readers). */
  def getSplits(spark: SparkSession, exportDir: String, table: String): Seq[String] = {
    val dir = new java.io.File(s"$exportDir/table=$table")
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getPath).sorted
  }

  /** One split's rows (StashReader.getSplit analog). */
  def readSplit(spark: SparkSession, splitPath: String): DataFrame =
    spark.read.json(splitPath)

  /** Table metadata: split count + total compressed bytes
    * (StashTableMetadata analog). */
  def tableMetadata(spark: SparkSession, exportDir: String, table: String): (String, Int, Long) = {
    val splits = getSplits(spark, exportDir, table)
    (table, splits.size, splits.map(p => new java.io.File(p).length()).sum)
  }
}
