package graft

import graft.engine.{EmoDocs, EventLog}
import graft.resolve.ResolveEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the minimum end-to-end slice of SURVEY §7.2 — build a delta log, resolve
    * documents by folding deltas in changeId order, filter with a condition
    * DSL expression, return docs with intrinsics. */
  def entry(spark: SparkSession): DataFrame = {
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val docs = ResolveEngine.resolve(changes)
    EmoDocs.where(docs, """{..,"last_type":in("purchase","signup"),"last_value":gt(0)}""")
      .toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. Each takes
    * (spark, sfDir) and must produce columns named identically to its
    * oracleSql counterpart. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.4 Resolve: the core fold — last-writer fields + version count
    "resolve_fold" -> { (s, dir) =>
      val docs = ResolveEngine.resolve(EventLog.changes(s, dir))
      docs.toDF()
        .select(
          col("id").as("key"),
          col("version"),
          get_json_object(col("body"), "$.last_type").as("last_type"),
          get_json_object(col("body"), "$.last_value").cast("double").as("last_value"),
          get_json_object(col("body"), "$.k").cast("long").as("last_k"))
        .orderBy("key")
    },

    // §2.4 Resolve: per-type last-writer fields from the map-delta merge
    "resolve_map_merge" -> { (s, dir) =>
      val docs = ResolveEngine.resolve(EventLog.changes(s, dir))
      docs.toDF()
        .select(
          col("id").as("key"),
          get_json_object(col("body"), "$.last_purchase").cast("double").as("last_purchase"),
          get_json_object(col("body"), "$.last_click").cast("double").as("last_click"),
          get_json_object(col("body"), "$.last_signup").cast("double").as("last_signup"))
        .orderBy("key")
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "resolve_fold" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
        |       count(*) AS version,
        |       arg_max(event_type, event_id) AS last_type,
        |       arg_max(value, event_id) AS last_value,
        |       CAST(arg_max(CAST(props->>'k' AS BIGINT), event_id) AS BIGINT) AS last_k
        |FROM events GROUP BY 1 ORDER BY key""".stripMargin,
    "resolve_map_merge" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
        |       arg_max(value, CASE WHEN event_type='purchase' THEN event_id END) FILTER (WHERE event_type='purchase') AS last_purchase,
        |       arg_max(value, CASE WHEN event_type='click' THEN event_id END) FILTER (WHERE event_type='click') AS last_click,
        |       arg_max(value, CASE WHEN event_type='signup' THEN event_id END) FILTER (WHERE event_type='signup') AS last_signup
        |FROM events GROUP BY 1 ORDER BY key""".stripMargin)
}
