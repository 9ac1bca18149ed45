package graft.spark

import graft.json.JsonCodec
import graft.resolve.{ChangeRow, DocRow}
import graft.streaming.KafkaBus
import graft.streaming.KafkaBus.KafkaConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kafka wiring below the format("kafka") line: option-map construction,
  * wire-schema encode/decode round trips (changes, refs, changelog with
  * null-value tombstones), and streaming-plan compatibility of the decode
  * transform. The broker-facing format() call itself needs the connector
  * jar at deploy time and is exercised nowhere here by design. */
class KafkaBusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Dress sink rows (key, value) up as kafka *source* rows — what the
    * connector would hand back after a round trip through the broker. */
  private def viaBroker(sinkRows: DataFrame): DataFrame =
    sinkRows.select(col("key"), col("value"), lit("t").as("topic"),
      lit(0).as("partition"), monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"), lit(0).as("timestampType"))

  private val changes = Seq(
    ChangeRow("tbl", "k1", 1000L, 0L, "n1", """{"name":"Bob"}""", Seq("tag1", "tag2")),
    ChangeRow("tbl", "k2", 2000L, 1L, "n2", "~", Seq.empty),
    ChangeRow("tbl2", "k/slash", 3000L, 0L, "n1", """{..,"x":1}""", Seq("a")))

  test("source and sink option maps") {
    val cfg = KafkaConfig("broker1:9092,broker2:9092", "emo.changes",
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(50000L),
      extra = Map("kafka.security.protocol" -> "SSL"))
    assert(KafkaBus.sourceOptions(cfg) === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "emo.changes",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SSL"))
    assert(KafkaBus.sinkOptions(cfg) === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "topic" -> "emo.changes",
      "kafka.security.protocol" -> "SSL"))
  }

  test("changes round-trip the wire format, coordinate-keyed") {
    val s = spark
    import s.implicits._
    val encoded = KafkaBus.encodeChanges(changes.toDS())
    assert(encoded.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      === Seq(("key", "binary"), ("value", "binary")))
    val keys = encoded.select(col("key").cast("string")).as[String].collect().sorted
    assert(keys === Array("tbl/k1", "tbl/k2", "tbl2/k/slash"))
    val back = KafkaBus.decodeChanges(viaBroker(encoded)).collect()
    assert(back.sortBy(c => (c.table, c.key)) === changes.sortBy(c => (c.table, c.key)))
  }

  test("refs round-trip") {
    val s = spark
    import s.implicits._
    val refs = Seq(("tbl", "k1", 1000L, 0L, "n1"), ("tbl", "k2", 2000L, 1L, "n2"))
      .toDF("table", "key", "ms", "seq", "node")
    val back = KafkaBus.decodeRefs(viaBroker(KafkaBus.encodeRefs(refs)))
    assert(back.as[(String, String, Long, Long, String)].collect().sorted
      === Array(("tbl", "k1", 1000L, 0L, "n1"), ("tbl", "k2", 2000L, 1L, "n2")))
  }

  private val liveDoc = DocRow("tbl", "k1", 3L, "ab12", deleted = false,
    1000L, 3000L, 3000L, "default", """{"name":"Bob"}""", Seq("tag1"), 1L)
  private val tombstone = DocRow("tbl", "k2", 2L, "cd34", deleted = true,
    1000L, 2000L, 2000L, "default", null, Seq.empty, 0L)

  test("changelog: live docs round-trip, deletes are null-value tombstones") {
    val s = spark
    import s.implicits._
    val encoded = KafkaBus.encodeChangelog(Seq(liveDoc, tombstone).toDS())
    val rows = encoded.select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect().toMap
    assert(rows("tbl/k2") === null)
    assert(rows("tbl/k1") != null && rows("tbl/k1").contains("\"signature\":\"ab12\""))

    val back = KafkaBus.decodeChangelog(viaBroker(encoded)).collect()
      .sortBy(_.id)
    assert(back(0) === liveDoc)
    // tombstone: coordinate + deleted survive; content fields are zeroed
    assert(back(1).table === "tbl" && back(1).id === "k2" &&
      back(1).deleted && back(1).body == null && back(1).version === 0L)
  }

  test("content-format changelog matches DocRow.contentJson, tombstones null") {
    val s = spark
    import s.implicits._
    val rows = KafkaBus.encodeChangelogContent(Seq(liveDoc, tombstone).toDS())
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect().toMap
    assert(rows("tbl/k2") === null)
    assert(rows("tbl/k1") === liveDoc.contentJson)
    // canonical, parseable, intrinsics present
    val parsed = JsonCodec.parse(rows("tbl/k1"))
    assert(JsonCodec.render(parsed) === rows("tbl/k1"))
  }

  test("megabus pipeline minus the broker: stream fold -> changelog encode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    // the exact megabusPipeline composition with the kafka edges replaced
    // by memory source/sink: encodeChangelog must be streaming-compatible
    val query = KafkaBus.encodeChangelog(
        graft.streaming.Materializer.materialize(input.toDS()))
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
      .writeStream.outputMode("append")
      .format("memory").queryName("megabus_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_megabus").toString)
      .start()
    try {
      input.addData(
        ChangeRow("t", "k1", 1000L, 0L, "n", """{"x":1}""", Seq.empty),
        ChangeRow("t", "k2", 1000L, 0L, "n", """{"y":2}""", Seq.empty))
      query.processAllAvailable()
      input.addData(ChangeRow("t", "k2", 2000L, 0L, "n", "~", Seq.empty))
      query.processAllAvailable()
      val out = spark.table("megabus_out").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.length === 3)
      // live doc carries the envelope; the delete is a null-value tombstone
      assert(out.count { case (k, v) => k == "t/k2" && v == null } === 1)
      assert(out.exists { case (k, v) =>
        k == "t/k1" && v != null && v.contains("\"body\":\"{\\\"x\\\":1}\"") })
    } finally query.stop()
  }

  test("decode transforms are streaming-plan compatible") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte])]
    val raw = input.toDF().select(col("_1").as("key"), col("_2").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
      current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val decoded = KafkaBus.decodeChanges(raw)
    assert(decoded.isStreaming)
    val query = decoded.writeStream.outputMode("append")
      .format("memory").queryName("kafka_decode_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_kafka").toString)
      .start()
    try {
      val wire = changes.map(c => (
        s"${c.table}/${c.key}".getBytes("UTF-8"),
        s"""{"table":"${c.table}","key":"${c.key}","ms":${c.ms},"seq":${c.seq},"node":"${c.node}","delta":${JsonCodec.render(graft.json.JString(c.delta))},"tags":[${c.tags.map(t => "\"" + t + "\"").mkString(",")}]}"""
          .getBytes("UTF-8")))
      input.addData(wire: _*)
      query.processAllAvailable()
      assert(spark.table("kafka_decode_out").count() === changes.size)
    } finally query.stop()
  }
}
