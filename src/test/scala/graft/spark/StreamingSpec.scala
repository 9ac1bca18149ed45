package graft.spark

import graft.resolve.ChangeRow
import graft.streaming.{Databus, Materializer, Subscription}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY §2.9): materializer changelog + tombstones +
  * redundant suppression, fanout on a stream, consolidation per micro-batch.
  * Scenarios mirror the reference's ConsolidationTest / RedundantDeltaTest /
  * DefaultFanoutTest shapes, driven through MemoryStream. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def change(key: String, ms: Long, delta: String, tags: Seq[String] = Seq.empty) =
    ChangeRow("t", key, ms, 0L, "n", delta, tags)

  test("materializer emits changelog with tombstones and suppresses redundant batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val query = Materializer.materialize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("mat_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mat").toString)
      .start()

    try {
      // batch 1: create two docs
      input.addData(
        change("k1", 1000, """{"name":"Bob","rating":3}"""),
        change("k2", 1000, """{"x":1}"""))
      query.processAllAvailable()
      val out1 = spark.table("mat_out").collect()
      assert(out1.length === 2)

      // batch 2: update k1, redundant write to k2 => only k1 emitted
      input.addData(
        change("k1", 2000, """{..,"rating":4}"""),
        change("k2", 2000, """{"x":1}"""))
      query.processAllAvailable()
      val out2 = spark.table("mat_out").collect()
      assert(out2.length === 3)
      val k1v2 = out2.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(k1v2.getAs[Long]("version") === 2)
      assert(k1v2.getAs[String]("body") === """{"name":"Bob","rating":4}""")

      // batch 3: delete k1 => tombstone row
      input.addData(change("k1", 3000, "~"))
      query.processAllAvailable()
      val out3 = spark.table("mat_out").collect()
      val tomb = out3.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(tomb.getAs[Boolean]("deleted") && tomb.getAs[Long]("version") === 3)

      // batch 4: resurrect k1; k2 stays silent
      input.addData(change("k1", 4000, """{..,"state":"APPROVED"}"""))
      query.processAllAvailable()
      val out4 = spark.table("mat_out").collect()
      val res = out4.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(!res.getAs[Boolean]("deleted"))
      assert(res.getAs[String]("body") === """{"state":"APPROVED"}""")
      assert(out4.count(r => r.getAs[String]("id") == "k2") === 1) // never re-emitted
    } finally query.stop()
  }

  test("streaming fanout routes events to matching subscription channels") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val subs = Seq(
      Subscription("tagged", """{..,"~tags":contains("etl")}"""),
      Subscription("key_k1", """intrinsic("~id":"k1")"""))
    val query = Databus.fanout(input.toDF(), subs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fanout_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_fan").toString)
      .start()
    try {
      input.addData(
        change("k1", 1000, "{}", Seq("etl")),
        change("k2", 1000, "{}", Seq("web")),
        change("k3", 1000, "{}", Seq("etl", "web")))
      query.processAllAvailable()
      val rows = spark.table("fanout_out")
        .select("subscription", "key").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows === Set(("tagged", "k1"), ("tagged", "k3"), ("key_k1", "k1")))
    } finally query.stop()
  }

  test("consolidation collapses a batch to one event per coordinate") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      change("k1", 1000, "a", Seq("t1")),
      change("k1", 2000, "b", Seq("t2")),
      change("k1", 3000, "c", Seq("t1")),
      change("k2", 1000, "z", Seq.empty)).toDF()
    val out = Databus.consolidate(batch, Seq("delta")).collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[String]("delta"), r.getAs[Seq[String]]("tags"), r.getAs[Long]("consolidated_count")))
      .toMap
    assert(out("k1") === (("c", Seq("t1", "t2"), 3L))) // max-changeId content, sorted tag union
    assert(out("k2") === (("z", Seq.empty, 1L)))
  }
}
