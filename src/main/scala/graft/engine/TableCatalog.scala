package graft.engine

import graft.resolve.{ChangeRow, ResolveEngine}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table metadata catalog — create/drop/template/options as a DELTA LOG on a
 * system table, resolved by the same fold as documents.
 *
 * This mirrors the reference exactly in spirit: table metadata lives in the
 * `__system` tables and changes to it are ordinary audited deltas
 * (table/db/astyanax/AstyanaxTableDAO; DataStore.java:48-95 createTable /
 * dropTable / setTableTemplate / getTableMetadata). The catalog at any
 * point in time is the resolve of its metadata log — so catalog history,
 * auditing, timeline and compaction all come for free from the engine's
 * core operator.
 */
object TableCatalog {

  val SystemTable = "__system:table"

  import graft.json.{JsonCodec, JString}

  /** Parse-validate arbitrary caller JSON and re-render it canonically —
    * the only safe way to splice it into delta text (a quote in a placement
    * name or a malformed template must fail HERE, not mis-fold later). */
  private def canonicalJson(what: String, text: String): String =
    try JsonCodec.render(JsonCodec.parse(text))
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"$what is not valid JSON: $text", e)
    }

  /** A createTable(name, placement, template) metadata delta
    * (DataStore.java:48; template is arbitrary JSON metadata). Rejects
    * illegal table names and `~`-prefixed template attributes — the
    * intrinsic namespace is reserved (DefaultDataStore.java:991,1006). */
  def createTable(name: String, placement: String, templateJson: String,
                  ms: Long, node: String = "catalog"): ChangeRow = {
    require(Names.isLegalTableName(name),
      s"Table name must be a lowercase ASCII string, 1-255 characters: $name")
    val template = canonicalJson("template", templateJson)
    requireLegalAttributes(template)
    ChangeRow(SystemTable, name, ms, 0L, node,
      s"""{"placement":${JsonCodec.render(JString(placement))},"template":$template}""",
      Seq("catalog"))
  }

  private def requireLegalAttributes(templateJson: String): Unit =
    JsonCodec.parse(templateJson) match {
      case graft.json.JObj(fields) => fields.keys.foreach { k =>
        require(Names.isLegalTableAttributeName(k),
          s"Table attribute names cannot start with '~': $k")
      }
      case _ => ()
    }

  /** setTableTemplate (DataStore.java:89): replaces the template only. */
  def setTemplate(name: String, templateJson: String, ms: Long,
                  node: String = "catalog"): ChangeRow = {
    val template = canonicalJson("template", templateJson)
    requireLegalAttributes(template)
    ChangeRow(SystemTable, name, ms, 1L, node,
      s"""{..,"template":$template}""", Seq("catalog"))
  }

  /** dropTable (DataStore.java:54): a tombstone on the metadata doc. */
  def dropTable(name: String, ms: Long, node: String = "catalog"): ChangeRow =
    ChangeRow(SystemTable, name, ms, 2L, node, "~", Seq("catalog"))

  /** The current catalog: fold of the metadata log. Dropped tables surface
    * with exists=false (their history is still in the log, like the
    * reference's audit trail). */
  def catalog(spark: SparkSession, metaLog: Seq[ChangeRow]): DataFrame = {
    import spark.implicits._
    ResolveEngine.resolve(metaLog.toDF()).toDF()
      .select(col("id").as("tbl"),
        get_json_object(col("body"), "$.placement").as("placement"),
        get_json_object(col("body"), "$.template").as("template"),
        (!col("deleted")).as("exists"),
        col("version"))
  }

  def tableExists(cat: DataFrame, name: String): Boolean =
    cat.where(col("tbl") === name && col("exists")).limit(1).count() == 1

  def getTemplate(cat: DataFrame, name: String): Option[String] =
    cat.where(col("tbl") === name && col("exists"))
      .select("template").collect().headOption.map(_.getString(0))

  /** Placement listing (DataStore.java:214 getTablePlacements). */
  def placements(cat: DataFrame): Seq[String] =
    cat.where(col("exists")).select("placement").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
}
