package graft.spark

import graft.engine.DocStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DocStore.merge: matched-update / not-matched-insert / tombstone-delete
  * semantics, untouched directories physically unchanged, emptied
  * directories handled, stats. */
class DocStoreMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(String, String, Long, Boolean, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("table", "id", "version", "deleted", "body")
  }

  private def dataFiles(path: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    walk(new java.io.File(path)).map(f => f.toString -> f.length).toMap
  }

  test("merge: update, insert, delete; untouched table's files byte-identical") {
    val base = docsDf((0 until 200).map(i =>
      (if (i % 2 == 0) "a" else "b", s"k$i", 1L, false, s"v$i")))
    val path = java.nio.file.Files.createTempDirectory("dsm_").toString + "/store"
    DocStore.write(base, path)
    val filesB = dataFiles(path).filter(_._1.contains("table=b"))

    val changes = docsDf(Seq(
      ("a", "k0", 2L, false, "updated"),   // matched update
      ("a", "knew", 1L, false, "inserted"), // not matched insert
      ("a", "k2", 1L, true, "")))           // tombstone
    val stats = DocStore.merge(spark, path, changes)
    assert(stats.upserts === 2L && stats.deletes === 1L)

    val got = DocStore.read(spark, path)
      .select("table", "id", "version", "body")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(("a", "k0")) === ((2L, "updated")))
    assert(got(("a", "knew")) === ((1L, "inserted")))
    assert(!got.contains(("a", "k2")))
    assert(got(("a", "k4")) === ((1L, "v4"))) // survivor untouched
    assert(got.size === 200 - 1 + 1)

    // table=b had no changes: not a single byte rewritten
    assert(dataFiles(path).filter(_._1.contains("table=b")) === filesB)
  }

  test("merge addresses escaped partition directories (':' in table names)") {
    // Spark writes 'table=sys%3Atbl' on disk (partition-value escaping);
    // the per-directory swap must target the ESCAPED name — the raw name
    // misses the real directory (and ':' in a relative Path is a URI error)
    val base = docsDf((0 until 40).map(i => ("sys:tbl", s"k$i", 1L, false, s"v$i")))
    val path = java.nio.file.Files.createTempDirectory("dsm_esc_").toString + "/store"
    DocStore.write(base, path)
    val changes = docsDf(Seq(
      ("sys:tbl", "k0", 2L, false, "updated"),
      ("sys:tbl", "k1", 1L, true, "")))
    val stats = DocStore.merge(spark, path, changes)
    assert(stats.upserts === 1L && stats.deletes === 1L)
    val got = DocStore.read(spark, path)
      .select("table", "id", "version", "body")
      .collect().map(r => (r.getString(1), (r.getLong(2), r.getString(3)))).toMap
    assert(got("k0") === ((2L, "updated")))
    assert(!got.contains("k1"))
    assert(got.size === 39)
    assert(DocStore.read(spark, path).select("table").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("sys:tbl"))
  }

  test("a directory emptied by tombstones disappears; scans stay correct") {
    val base = docsDf(Seq(("t", "only", 1L, false, "x"),
      ("u", "other", 1L, false, "y")))
    val path = java.nio.file.Files.createTempDirectory("dsm_empty_").toString + "/store"
    DocStore.write(base, path)
    DocStore.merge(spark, path, docsDf(Seq(("t", "only", 2L, true, ""))))
    val left = DocStore.read(spark, path).select("table", "id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(left.toSeq === Seq(("u", "other")))
  }

  test("merge batch counts are computed before the swap (store-derived changes safe)") {
    val base = docsDf((0 until 50).map(i => ("t", s"k$i", 1L, false, s"v$i")))
    val path = java.nio.file.Files.createTempDirectory("dsm_lin_").toString + "/store"
    DocStore.write(base, path)
    // changes DERIVED FROM THE STORE ITSELF — the lineage trap
    val changes = DocStore.read(spark, path)
      .where(col("id") === "k7")
      .withColumn("version", col("version") + 1)
      .drop(DocStore.PartCol)
    val stats = DocStore.merge(spark, path, changes)
    assert(stats.upserts === 1L && stats.deletes === 0L)
    val v = DocStore.read(spark, path).where(col("id") === "k7")
      .collect().map(_.getAs[Long]("version"))
    assert(v.toSeq === Seq(2L))
  }
}
