package graft.engine

import graft.resolve.ChangeRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table placement moves as staged metadata deltas (SURVEY §2.1; reference
 * table/db/astyanax/AstyanaxTableDAO.move + TableLifeCycleTest). The
 * reference's move is a little state machine — create a destination
 * storage as an activated mirror, copy data, promote the mirror to
 * primary, then drop the source after a consistency delay. Its essential
 * single-cluster semantics survive intact here:
 *
 *  - `moveStart`: the catalog doc gains `moveTo: {placement, state:
 *    "mirror_activated"}`. READS stay on the source placement; WRITES
 *    mirror to BOTH (TableLifeCycleTest.testMoveStart: read storage = src,
 *    write storages = {src, dest}).
 *  - the data copy is a partitioned rewrite of the resolved table into the
 *    destination store ([[copySnapshot]]) — the "Move:copy-data"
 *    maintenance op re-expressed as a Spark write.
 *  - `movePromote`: placement swaps to the destination; the source demotes
 *    to a mirror (`state: "demoted"`) and continues receiving writes, so
 *    a cancel after promote needs no second copy
 *    (testMoveCanceledAfterPromote re-uses the existing storages).
 *  - `moveComplete`: the mirror entry is dropped ("Move:drop-source").
 *  - `moveCancel` before promote: the destination mirror is dropped.
 *
 * Because every step is an ordinary audited delta on the system table, the
 * whole move history lands in the timeline/audit surface for free.
 */
object TableMove {

  import graft.json.{JsonCodec, JString}

  private def moveToJson(placement: String, state: String): String =
    s"""{"placement":${JsonCodec.render(JString(placement))},"state":${JsonCodec.render(JString(state))}}"""

  /** Begin a move: destination mirror activated, writes mirror to both. */
  def moveStart(name: String, destPlacement: String, ms: Long,
                node: String = "catalog"): ChangeRow =
    ChangeRow(TableCatalog.SystemTable, name, ms, 10L, node,
      s"""{..,"moveTo":${moveToJson(destPlacement, "mirror_activated")}}""",
      Seq("catalog", "move"))

  /** Promote the destination to primary; the source stays as a demoted
    * mirror (still written) until `moveComplete`. */
  def movePromote(name: String, srcPlacement: String, destPlacement: String,
                  ms: Long, node: String = "catalog"): ChangeRow =
    ChangeRow(TableCatalog.SystemTable, name, ms, 11L, node,
      s"""{..,"placement":${JsonCodec.render(JString(destPlacement))},"moveTo":${moveToJson(srcPlacement, "demoted")}}""",
      Seq("catalog", "promote"))

  /** Finish the move: drop the demoted source mirror. */
  def moveComplete(name: String, ms: Long, node: String = "catalog"): ChangeRow =
    ChangeRow(TableCatalog.SystemTable, name, ms, 12L, node,
      """{..,"moveTo":~}""", Seq("catalog", "move"))

  /** Cancel before promote: drop the destination mirror; reads and writes
    * return to the source alone. */
  def moveCancel(name: String, ms: Long, node: String = "catalog"): ChangeRow =
    ChangeRow(TableCatalog.SystemTable, name, ms, 13L, node,
      """{..,"moveTo":~}""", Seq("catalog", "move"))

  /** The catalog with move-routing columns: `read_placement` (the primary)
    * and `write_placements` (primary + in-flight mirror, sorted) — the
    * relational form of AstyanaxTable.getReadStorage/getWriteStorage. */
  def routing(spark: SparkSession, metaLog: Seq[ChangeRow]): DataFrame = {
    import graft.resolve.ResolveEngine
    import spark.implicits._
    ResolveEngine.resolve(metaLog.toDF()).toDF()
      .select(col("id").as("tbl"),
        get_json_object(col("body"), "$.placement").as("read_placement"),
        get_json_object(col("body"), "$.moveTo.placement").as("mirror_placement"),
        get_json_object(col("body"), "$.moveTo.state").as("move_state"),
        (!col("deleted")).as("exists"))
      .withColumn("write_placements",
        array_sort(filter(array(col("read_placement"), col("mirror_placement")),
          _.isNotNull)))
  }

  /** The data-copy step: the resolved table snapshot as a DataFrame for a
    * partitioned write into the destination store. Runs while writes are
    * mirrored, so deltas landing during the copy reach the destination via
    * the mirror; the copy only needs the snapshot (the reference's
    * AstyanaxStorage copy + mirroring gives the same no-lost-writes
    * guarantee). */
  def copySnapshot(resolvedDocs: DataFrame, table: String): DataFrame =
    resolvedDocs.where(col("table") === table)

  /**
   * Drop/promote events are NOT published on the databus — the reference
   * surfaces them from a registry so consumers can reconcile tables that
   * vanished or moved under them (AstyanaxTableDAO
   * .listUnpublishedDatabusEvents, TableLifeCycleTest
   * .testListUnpublishedDatabusEvents). Here the registry IS the metadata
   * log: drops are tombstone deltas, promotes are tagged move deltas.
   * Returns (event_ms, tbl, event) within `[fromMs, toMs)`.
   */
  def listUnpublishedDatabusEvents(spark: SparkSession, metaLog: Seq[ChangeRow],
                                   fromMs: Long, toMs: Long): DataFrame = {
    import spark.implicits._
    metaLog.toDF()
      .where(col("table") === TableCatalog.SystemTable &&
        col("ms") >= fromMs && col("ms") < toMs)
      .withColumn("event",
        when(col("delta") === "~", lit("drop"))
          .when(array_contains(col("tags"), "promote"), lit("promote")))
      .where(col("event").isNotNull)
      .select(col("ms").as("event_ms"), col("key").as("tbl"), col("event"))
  }
}
