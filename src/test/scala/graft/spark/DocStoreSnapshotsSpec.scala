package graft.spark

import graft.engine.DocStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DocStore.Snapshots: pointer publishing, time travel, rollback,
  * vacuum retention, generation isolation. */
class DocStoreSnapshotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(n: Int, tag: String) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => ("t", s"k$i", 1L, s"$tag$i")).toDF("table", "id", "version", "body")
  }

  test("publish, latest pointer, time travel, rollback") {
    val root = java.nio.file.Files.createTempDirectory("snap_").toString + "/s"
    val v1 = DocStore.Snapshots.write(docs(10, "a"), root)
    val v2 = DocStore.Snapshots.write(docs(20, "b"), root)
    assert(v1 === 1L && v2 === 2L)
    assert(DocStore.Snapshots.latest(spark, root) === Some(2L))
    assert(DocStore.Snapshots.read(spark, root).count() === 20)
    assert(DocStore.Snapshots.read(spark, root, v1).count() === 10)
    // a v1 frame read BEFORE v2's publish still resolves to v1 data
    val pinned = DocStore.Snapshots.read(spark, root, v1)
    DocStore.Snapshots.write(docs(30, "c"), root)
    assert(pinned.count() === 10)

    DocStore.Snapshots.rollback(spark, root, v1)
    assert(DocStore.Snapshots.latest(spark, root) === Some(1L))
    assert(DocStore.Snapshots.read(spark, root)
      .select("body").collect().map(_.getString(0)).forall(_.startsWith("a")))
    intercept[IllegalArgumentException] {
      DocStore.Snapshots.rollback(spark, root, 99L)
    }
  }

  test("vacuum drops old generations but never the pointed-at one") {
    val root = java.nio.file.Files.createTempDirectory("snap_v_").toString + "/s"
    (1 to 4).foreach(i => DocStore.Snapshots.write(docs(i, "g"), root))
    // pointer at v4; keep 2 -> v1, v2 removed
    assert(DocStore.Snapshots.vacuum(spark, root, keep = 2) === Seq(1L, 2L))
    assert(DocStore.Snapshots.versions(spark, root) === Seq(3L, 4L))
    // roll back to v3, then vacuum keep=1: v3 is pinned, survives
    DocStore.Snapshots.rollback(spark, root, 3L)
    assert(DocStore.Snapshots.vacuum(spark, root, keep = 1) === Seq.empty)
    assert(DocStore.Snapshots.versions(spark, root) === Seq(3L, 4L))
    assert(DocStore.Snapshots.read(spark, root).count() === 3)
  }

  test("merge composes with snapshots: mutate the latest generation in place") {
    val root = java.nio.file.Files.createTempDirectory("snap_m_").toString + "/s"
    val s = spark
    import s.implicits._
    DocStore.Snapshots.write(
      (0 until 10).map(i => ("t", s"k$i", 1L, false, s"v$i"))
        .toDF("table", "id", "version", "deleted", "body"), root)
    val v = DocStore.Snapshots.latest(spark, root).get
    DocStore.merge(spark, s"$root/v=$v",
      Seq(("t", "k3", 2L, false, "patched"))
        .toDF("table", "id", "version", "deleted", "body"))
    val got = DocStore.Snapshots.read(spark, root)
      .where(col("id") === "k3").select("body").collect().map(_.getString(0))
    assert(got.toSeq === Seq("patched"))
  }
}
