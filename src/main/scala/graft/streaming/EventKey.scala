package graft.streaming

/**
 * Databus event-key codec — wire parity with the reference's compact
 * encoding of multiple event-store ids into one databus event key
 * (databus/core/EventKeyFormat.java:41-91). Event ids are lowercase hex
 * (typically 32-char slab id + 4-char counter + 4-char checksum); ids in
 * a key are concatenated with two delimiters:
 *
 *   'I'  the next id starts from scratch;
 *   'X'  the next id is the SAME LENGTH and shares a common prefix with
 *        the previous — only the differing suffix follows ("abcdef",
 *        "abcghi" encode as "abcdefXghi").
 *
 * Sequential ids in one slab share the 32-char prefix and most counter
 * digits, so sorted runs compress to a few chars per id. Sorting before
 * encoding is the caller's (documented) compaction lever, exactly as in
 * the reference.
 */
object EventKey {

  private def isValid(id: String): Boolean =
    id.nonEmpty && id.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))

  private def checkValid(id: String): String = {
    require(isValid(id), s"Invalid event ID: $id")
    id
  }

  private def commonPrefixLength(a: String, b: String): Int = {
    val max = math.min(a.length, b.length)
    var i = 0
    while (i < max && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  /** Combine event ids into one event key (sort first for compactness). */
  def encode(eventIds: Seq[String]): String = {
    require(eventIds.nonEmpty, "Empty event ID list.")
    if (eventIds.size == 1) return checkValid(eventIds.head)
    val buf = new java.lang.StringBuilder
    var prev: String = null
    eventIds.foreach { id =>
      checkValid(id)
      if (prev == null) buf.append(id)
      else {
        val p = if (prev.length == id.length) commonPrefixLength(prev, id) else 0
        if (prev.length == id.length && p > 0)
          buf.append('X').append(id.substring(p))
        else buf.append('I').append(id)
      }
      prev = id
    }
    buf.toString
  }

  /** Split one event key back into its event ids. */
  def decode(eventKey: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var startIdx = 0
    var prev: String = null
    def combine(chunk: String): String =
      if (prev == null) chunk
      else {
        // an X continuation can only REPLACE a suffix of the previous id
        require(chunk.length <= prev.length,
          s"Malformed event key: X chunk '$chunk' longer than previous id '$prev'")
        prev.substring(0, prev.length - chunk.length) + chunk
      }
    var i = 0
    while (i < eventKey.length) {
      val ch = eventKey.charAt(i)
      if (ch == 'I' || ch == 'X') {
        val id = checkValid(combine(eventKey.substring(startIdx, i)))
        out += id
        prev = if (ch == 'I') null else id
        startIdx = i + 1
      }
      i += 1
    }
    out += checkValid(combine(eventKey.substring(startIdx)))
    out.result()
  }

  /** Split many event keys (claim batches ride as key lists). */
  def decodeAll(eventKeys: Seq[String]): Seq[String] =
    eventKeys.flatMap(decode)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge

  /** Column: array<string> of event ids -> encoded event key. */
  def encodeCol(ids: Column): Column =
    GraftBridge.column(EventKeyEncodeExpr(GraftBridge.expression(ids)))

  /** Column: event key -> array<string> of event ids. */
  def decodeCol(key: Column): Column =
    GraftBridge.column(EventKeyDecodeExpr(GraftBridge.expression(key)))
}

case class EventKeyEncodeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ids = (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
    org.apache.spark.unsafe.types.UTF8String.fromString(EventKey.encode(ids))
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

case class EventKeyDecodeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any = {
    val ids = EventKey.decode(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ids.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}
