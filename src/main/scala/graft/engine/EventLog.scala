package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Canonical mapping from the driver's `events` table to a delta log
 * (graft.resolve.ChangeRow schema). This is the EmoDB-semantic fixture used
 * by the correctness queries: each event is one delta against the per-user
 * document in table "events":
 *
 *   key      = user_id (as string)
 *   changeId = (ms = epoch millis of ts, seq = event_id, node = "")
 *              -- ts is monotone in event_id in the testdata, so fold order
 *                 == event_id order and DuckDB arg_max(x, event_id) is an
 *                 exact oracle for last-writer fields
 *   delta    = {..,"last_type":"<event_type>","last_value":<value>,
 *                  "last_<event_type>":<value>,"k":<props.k>}
 *   tags     = [event_type]
 *
 * Resolved document fields are therefore SQL-expressible: last_type/
 * last_value = global last writer, last_<t> = last writer per type,
 * k = last props.k, ~version = count of events.
 */
object EventLog {

  def changes(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val valueStr = ev("value").cast("string")
    ev.select(
      lit("events").as("table"),
      col("user_id").cast("string").as("key"),
      col("ts_ms").as("ms"),
      col("event_id").cast("long").as("seq"),
      lit("").as("node"),
      concat(
        lit("{..,\"last_type\":\""), col("event_type"),
        lit("\",\"last_value\":"), valueStr,
        lit(",\"last_"), col("event_type"), lit("\":"), valueStr,
        lit(",\"k\":"), get_json_object(col("props"), "$.k"),
        lit("}")).as("delta"),
      array(col("event_type")).as("tags"))
  }

  /** Generic variant: build the change log with a custom delta text column
    * and tags column over the events table. */
  def changesWith(spark: SparkSession, sfDir: String,
                  delta: org.apache.spark.sql.Column,
                  tags: org.apache.spark.sql.Column): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(
      lit("events").as("table"),
      col("user_id").cast("string").as("key"),
      col("ts_ms").as("ms"),
      col("event_id").cast("long").as("seq"),
      lit("").as("node"),
      delta.as("delta"),
      tags.as("tags"))
  }

  /** Change log with a per-change audit record (Change.java:25-46 pairs an
    * optional Audit with each delta; the analog is a JSON audit column that
    * rides through the timeline read path untouched). */
  def changesWithAudit(spark: SparkSession, sfDir: String): DataFrame = {
    changes(spark, sfDir).withColumn("audit",
      to_json(struct(
        // tags carry the event type; seq IS the event id in this log
        element_at(col("tags"), 1).as("program"),
        col("seq").as("change"))))
  }

  /** Set-delta log: each event adds its type to the doc's sorted "types" set. */
  def setDeltaChanges(spark: SparkSession, sfDir: String): DataFrame =
    changesWith(spark, sfDir,
      concat(lit("{..,\"types\":(..,\""), col("event_type"), lit("\")}")),
      array(col("event_type")))

  /** Conditional-delta log: running max via CAS delta
    * `{..,"max_value":if or(~,lt(V)) then V end}`. */
  def maxDeltaChanges(spark: SparkSession, sfDir: String): DataFrame =
    changesWith(spark, sfDir,
      concat(lit("{..,\"max_value\":if or(~,lt("), col("value").cast("string"),
        lit(")) then "), col("value").cast("string"), lit(" end}")),
      array(col("event_type")))

  /** Delete-delta log: an 'error' event deletes the document; anything else
    * writes its type. Exercises tombstones + resurrect-on-update. */
  def deleteOnErrorChanges(spark: SparkSession, sfDir: String): DataFrame =
    changesWith(spark, sfDir,
      when(col("event_type") === "error", lit("~"))
        .otherwise(concat(lit("{..,\"t\":\""), col("event_type"), lit("\"}"))),
      array(col("event_type")))

  /** A second document table in the same placement: each order is one
    * literal-delta document in table "orders" — used by the multi-table /
    * placement-scan queries. */
  def ordersChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
    o.select(
      lit("orders").as("table"),
      col("o_orderkey").cast("string").as("key"),
      // o_orderdate reads as TIMESTAMP_NTZ; go through TIMESTAMP (UTC session)
      (unix_micros(col("o_orderdate").cast("timestamp")) / 1000L).cast("long").as("ms"),
      col("o_orderkey").cast("long").as("seq"),
      lit("").as("node"),
      concat(
        lit("{\"status\":\""), col("o_orderstatus"),
        lit("\",\"priority\":\""), col("o_orderpriority"),
        lit("\",\"total\":"), col("o_totalprice").cast("string"),
        lit("}")).as("delta"),
      array(lit("order")).as("tags"))
  }

  /** The whole placement: every table's change log unioned. */
  def placementChanges(spark: SparkSession, sfDir: String): DataFrame =
    changes(spark, sfDir).unionByName(ordersChanges(spark, sfDir))

  /** Content-only log with constant (empty) tags: consecutive same-type
    * events are redundant changes (DefaultResolver.java:73-90 semantics). */
  def typeOnlyChanges(spark: SparkSession, sfDir: String): DataFrame =
    changesWith(spark, sfDir,
      concat(lit("{\"t\":\""), col("event_type"), lit("\"}")),
      array().cast("array<string>"))
}
