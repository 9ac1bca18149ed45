package graft.spark

import graft.engine.DocStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DocStore.optimize: small-file compaction is layout-only (content
  * identity), collapses file counts, splits oversized directories, sorts
  * ids within files, and leaves the store scannable with pruning. */
class DocStoreOptimizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      val table = if (i % 3 == 0) "orders" else "reviews"
      (table, s"k$i", 1L, s"""{"v":$i}""")
    }.toDF("table", "id", "version", "body")
  }

  private def dataFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    walk(new java.io.File(path))
  }

  test("optimize collapses small files, preserves content exactly, keeps pruning") {
    val docs = docsDf(2000)
    val path = java.nio.file.Files.createTempDirectory("dso_").toString + "/store"
    // accretion pattern: 16 writer tasks -> up to 16 files per directory
    DocStore.writeFragmented(docs, path, tasks = 16)
    val before = dataFiles(path).size
    val contentBefore = DocStore.read(spark, path)
      .select("table", "id", "version", "body")
      .collect().map(_.toSeq).toSet

    val stats = DocStore.optimize(spark, path)
    assert(stats.filesBefore === before)
    assert(stats.filesAfter < before / 3,
      s"expected a big collapse, got ${stats.filesBefore} -> ${stats.filesAfter}")
    assert(stats.filesAfter === dataFiles(path).size)
    // one file per (table, part) directory at the default huge target
    assert(stats.filesAfter === stats.dirs)

    val contentAfter = DocStore.read(spark, path)
      .select("table", "id", "version", "body")
      .collect().map(_.toSeq).toSet
    assert(contentAfter === contentBefore)

    // pruned condition scan still works post-swap
    val orders = DocStore.scan(spark, path, """intrinsic("~table":"orders")""")
    assert(orders.count() === contentBefore.count(_.head == "orders"))
  }

  test("oversized directories split across multiple id-sorted files") {
    val docs = docsDf(3000)
    val path = java.nio.file.Files.createTempDirectory("dso_split_").toString + "/store"
    DocStore.writeFragmented(docs, path, tasks = 4)
    val perDirBytes = dataFiles(path)
      .groupBy(_.getParentFile.toString).map(_._2.map(_.length).sum)
    // target ~1/3 of the biggest directory: splits must happen
    val stats = DocStore.optimize(spark, path,
      targetFileBytes = math.max(1L, perDirBytes.max / 3))
    assert(stats.filesAfter > stats.dirs, s"expected splits, got $stats")

    // ids sorted within every file
    val byFile = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("id"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq)
    byFile.foreach { case (f, ids) =>
      assert(ids === ids.sorted, s"unsorted ids in $f")
    }
  }

  test("optimize slot sizing matches escaped partition directories (':' tables)") {
    val s = spark
    import s.implicits._
    // on disk the directory is 'table=sys%3Atbl': the per-directory byte
    // lookup must key on the UNESCAPED value or slots silently default to 1
    val docs = (0 until 3000).map(i => ("sys:tbl", s"k$i", 1L, s"""{"v":$i}"""))
      .toDF("table", "id", "version", "body")
    val path = java.nio.file.Files.createTempDirectory("dso_esc_").toString + "/store"
    DocStore.writeFragmented(docs, path, tasks = 4)
    val perDirBytes = dataFiles(path)
      .groupBy(_.getParentFile.toString).map(_._2.map(_.length).sum)
    val stats = DocStore.optimize(spark, path,
      targetFileBytes = math.max(1L, perDirBytes.max / 3))
    assert(stats.dirs > 0 && spark.read.parquet(path).count() === 3000L)
    // the slot lookup keys on the UNESCAPED directory name (':' restored
    // from '%3A'); the on-disk listing keys would otherwise never match
    // the raw column values and every directory would fall back to 1 slot
    assert(DocStore.storeDirKey("/root/store/table=sys%3Atbl/part=3", "/root/store")
      === "/table=sys:tbl/part=3")
  }

  test("optimize of an already-compact store is idempotent on content and file count") {
    val docs = docsDf(500)
    val path = java.nio.file.Files.createTempDirectory("dso_idem_").toString + "/store"
    DocStore.write(docs, path)
    val s1 = DocStore.optimize(spark, path)
    val s2 = DocStore.optimize(spark, path)
    assert(s2.filesBefore === s1.filesAfter)
    assert(s2.filesAfter === s1.filesAfter)
    assert(DocStore.read(spark, path).count() === 500)
  }
}
