package graft.engine

import graft.json.{JObj, JString, JValue}

/**
 * A (table, id) document address (reference sor-api Coordinate.java).
 * `toString` is the wire form `table/id`; `parse` splits on the FIRST
 * slash, requires the table part to be a legal table name, and lets the id
 * contain anything (including further slashes and whitespace). The JSON
 * form is the two intrinsics, `{"~table": ..., "~id": ...}`.
 */
final case class Coordinate(table: String, id: String) {
  require(table != null && id != null, "table and id are required")
  override def toString: String = s"$table/$id"
  def asJson: JValue = JObj(Map("~table" -> JString(table), "~id" -> JString(id)))
}

object Coordinate {
  def of(table: String, id: String): Coordinate = Coordinate(table, id)

  def parse(s: String): Coordinate = {
    val slash = s.indexOf('/')
    require(slash > 0 && slash < s.length - 1, s"Invalid coordinate format: $s")
    val table = s.substring(0, slash)
    require(Names.isLegalTableName(table), s"Invalid table name: $table")
    Coordinate(table, s.substring(slash + 1))
  }

  def fromJson(json: JValue): Coordinate = json match {
    case JObj(fields) =>
      def str(k: String): String = fields.get(k) match {
        case Some(JString(v)) => v
        case _ => throw new NullPointerException(s"missing $k")
      }
      Coordinate(str("~table"), str("~id"))
    case other => throw new IllegalArgumentException(s"not a coordinate object: $other")
  }
}
