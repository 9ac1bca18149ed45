package graft.streaming

import graft.resolve.{ChangeRow, DocRow}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/**
 * Kafka wiring for the change/ref/changelog pipelines (SURVEY §2.1, §2.9;
 * reference megabus — refproducer MegabusRefProducer.java publishes update
 * refs to Kafka, resolver MegabusRefResolver.java:101-134 consumes refs,
 * resolves against the store and publishes resolved documents, deletes as
 * log-compaction tombstones).
 *
 * Everything except the two `format("kafka")` call sites is a plain plan
 * transformation, unit-testable without a broker or the connector jar:
 *  - option-map construction ([[sourceOptions]] / [[sinkOptions]]) is pure;
 *  - encode/decode are DataFrame transforms between typed rows and the
 *    Kafka wire schema (key/value binary), built from `from_json`/`to_json`
 *    with fixed schemas — native, codegen'd, no UDFs.
 *
 * Deployment note: the spark-sql-kafka connector jar is NOT bundled here
 * (absent from this build's classpath by design); `readChangeStream` /
 * `writeStream` require `--packages org.apache.spark:spark-sql-kafka-0-10`
 * at submit time. Everything below the format() call is exercised by tests.
 *
 * Partitioning contract (load-bearing at scale): every record is keyed by
 * the coordinate string `table/key`, so Kafka hash-partitions by
 * coordinate and guarantees per-coordinate arrival order. That is exactly
 * the order [[Materializer.materialize]]'s fold needs — its groupByKey on
 * (table, key) re-partitions 1:1 with the topic's key space, and no
 * cross-coordinate ordering is required anywhere.
 */
object KafkaBus {

  /** Connection + topic config. `extra` passes through verbatim (e.g.
    * kafka.security.protocol); keys here win over computed defaults. */
  final case class KafkaConfig(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty)

  def sourceOptions(cfg: KafkaConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.extra

  def sinkOptions(cfg: KafkaConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "topic" -> cfg.topic) ++ cfg.extra

  /** The schema the kafka source emits (what decode transforms accept). */
  val kafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Wire schema of a change record's value: the ChangeRow fields as JSON.
    * Fixed-schema, so decode is a native from_json (no per-row dispatch). */
  val changeValueSchema: StructType = StructType(Seq(
    StructField("table", StringType), StructField("key", StringType),
    StructField("ms", LongType), StructField("seq", LongType),
    StructField("node", StringType), StructField("delta", StringType),
    StructField("tags", ArrayType(StringType))))

  /** Wire schema of an update ref (MegabusRef analog: coordinate +
    * changeId; the payload travels separately through the store). */
  val refValueSchema: StructType = StructType(Seq(
    StructField("table", StringType), StructField("key", StringType),
    StructField("ms", LongType), StructField("seq", LongType),
    StructField("node", StringType)))

  /** Wire schema of a resolved-document changelog record's value. Deletes
    * do NOT use this — a delete is a null-value tombstone so Kafka log
    * compaction retires the coordinate (MegabusRefResolver delete path). */
  val docValueSchema: StructType = StructType(Seq(
    StructField("table", StringType), StructField("id", StringType),
    StructField("version", LongType), StructField("signature", StringType),
    StructField("deleted", BooleanType),
    StructField("first_update_ms", LongType),
    StructField("last_update_ms", LongType),
    StructField("last_mutate_ms", LongType),
    StructField("placement", StringType), StructField("body", StringType),
    StructField("last_tags", ArrayType(StringType)),
    StructField("redundant_changes", LongType)))

  private val coordinateKey = concat_ws("/", col("table"), col("key"))

  // ------------------------------------------------------------- changes

  /** ChangeRows -> Kafka sink rows (key: coordinate, value: JSON). */
  def encodeChanges(changes: Dataset[ChangeRow]): DataFrame =
    changes.toDF().select(
      coordinateKey.cast(BinaryType).as("key"),
      to_json(struct(col("table"), col("key"), col("ms"), col("seq"),
        col("node"), col("delta"), col("tags"))).cast(BinaryType).as("value"))

  /** Kafka source rows -> ChangeRows (native from_json on the fixed wire
    * schema; the coordinate key is redundant with the value and ignored). */
  def decodeChanges(raw: DataFrame): Dataset[ChangeRow] = {
    implicit val enc = Encoders.product[ChangeRow]
    raw.select(from_json(col("value").cast(StringType), changeValueSchema).as("c"))
      .select(col("c.table"), col("c.key"), col("c.ms"), col("c.seq"),
        col("c.node"), col("c.delta"),
        coalesce(col("c.tags"), array()).as("tags"))
      .as[ChangeRow]
  }

  // ---------------------------------------------------------------- refs

  /** Update refs (columns table, key, ms, seq, node) -> Kafka sink rows. */
  def encodeRefs(refs: DataFrame): DataFrame =
    refs.select(
      coordinateKey.cast(BinaryType).as("key"),
      to_json(struct(col("table"), col("key"), col("ms"), col("seq"),
        col("node"))).cast(BinaryType).as("value"))

  def decodeRefs(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast(StringType), refValueSchema).as("r"))
      .select("r.*")

  // ----------------------------------------------------------- changelog

  /** Resolved-doc changelog -> Kafka sink rows. Live documents carry the
    * full DocRow as JSON; deletes carry a NULL value (log-compaction
    * tombstone) with the coordinate in the key — consumers and the broker's
    * compactor both retire the coordinate on sight. */
  def encodeChangelog(docs: Dataset[DocRow]): DataFrame =
    docs.toDF().select(
      concat_ws("/", col("table"), col("id")).cast(BinaryType).as("key"),
      when(col("deleted"), lit(null).cast(BinaryType))
        .otherwise(to_json(struct(col("table"), col("id"), col("version"),
          col("signature"), col("deleted"), col("first_update_ms"),
          col("last_update_ms"), col("last_mutate_ms"), col("placement"),
          col("body"), col("last_tags"), col("redundant_changes")))
          .cast(BinaryType)).as("value"))

  /** Kafka changelog rows -> DocRows. Tombstones (null value) reconstruct
    * coordinate + deleted=true from the key; every other field of a
    * tombstone is its type's zero (the document is gone — version history
    * lives in the change topic, not here). */
  def decodeChangelog(raw: DataFrame): Dataset[DocRow] = {
    implicit val enc = Encoders.product[DocRow]
    val key = col("key").cast(StringType)
    val d = from_json(col("value").cast(StringType), docValueSchema)
    raw.select(
      coalesce(d.getField("table"), substring_index(key, "/", 1)).as("table"),
      coalesce(d.getField("id"),
        expr("substring(CAST(key AS STRING), instr(CAST(key AS STRING), '/') + 1)")).as("id"),
      coalesce(d.getField("version"), lit(0L)).as("version"),
      coalesce(d.getField("signature"), lit("")).as("signature"),
      coalesce(d.getField("deleted"), lit(true)).as("deleted"),
      coalesce(d.getField("first_update_ms"), lit(0L)).as("first_update_ms"),
      coalesce(d.getField("last_update_ms"), lit(0L)).as("last_update_ms"),
      coalesce(d.getField("last_mutate_ms"), lit(0L)).as("last_mutate_ms"),
      coalesce(d.getField("placement"), lit("")).as("placement"),
      d.getField("body").as("body"),
      coalesce(d.getField("last_tags"), array()).as("last_tags"),
      coalesce(d.getField("redundant_changes"), lit(0L)).as("redundant_changes")
    ).as[DocRow]
  }

  /** Reference-parity document payload: the flattened content JSON (body
    * fields + ~intrinsics, canonical key order) that megabus publishes,
    * rather than the structured envelope above. Tombstones are null-value
    * as always. Encoder-typed map — this is the serialization edge, the
    * one place per-row JSON assembly is inherent. */
  def encodeChangelogContent(docs: Dataset[DocRow]): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.BINARY, Encoders.BINARY)
    docs.map { doc =>
      val key = s"${doc.table}/${doc.id}".getBytes("UTF-8")
      val value = if (doc.deleted) null else doc.contentJson.getBytes("UTF-8")
      (key, value)
    }.toDF("key", "value")
  }

  // ------------------------------------------------- format("kafka") glue

  /** The untestable-here edge: requires the spark-sql-kafka connector on
    * the classpath at runtime. */
  def readChangeStream(spark: SparkSession, cfg: KafkaConfig): Dataset[ChangeRow] =
    decodeChanges(
      spark.readStream.format("kafka").options(sourceOptions(cfg)).load())

  def readRefStream(spark: SparkSession, cfg: KafkaConfig): DataFrame =
    decodeRefs(
      spark.readStream.format("kafka").options(sourceOptions(cfg)).load())

  /** Changelog stream -> Kafka topic. Append mode: the materializer emits
    * one row per coordinate per mutating batch, which is precisely a
    * changelog topic's contract. */
  def writeChangelogStream(docs: Dataset[DocRow], cfg: KafkaConfig,
                           checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    encodeChangelog(docs).writeStream
      .format("kafka")
      .options(sinkOptions(cfg))
      .option("checkpointLocation", checkpointDir)

  /** End-to-end megabus topology, assembled: change topic -> materialized
    * fold -> changelog topic. Returns the writer; `.start()` runs it. */
  def megabusPipeline(spark: SparkSession, source: KafkaConfig, sink: KafkaConfig,
                      checkpointDir: String,
                      placement: String = "default"): DataStreamWriter[org.apache.spark.sql.Row] =
    writeChangelogStream(
      Materializer.materialize(readChangeStream(spark, source), placement),
      sink, checkpointDir)
}
