package graft.engine

import graft.condition.{Condition, ConditionEvaluator, Conditions, IntrinsicsView}
import graft.json.{Hashes, JsonCodec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions (SURVEY §4.3).
 *
 * `EmoHash32` gives bit-parity with the reference's Guava murmur3_32 use
 * (partition + shard hashing, ConditionEvaluator.java:266-276 /
 * RowKeyUtils.java:69-70) — Spark's builtin `hash()` is murmur3 with a
 * different seed and per-field combining, so it cannot be reused.
 *
 * `EmoCondEval` is the exact-parity fallback for evaluating a condition DSL
 * expression against a schemaless JSON document body (+ optional intrinsic
 * columns): semantics Catalyst cannot express natively (UNDEFINED vs null,
 * type-strict equality on heterogeneous values).
 */
case class EmoHash32(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    var total = 0
    val byteArrays = new Array[Array[Byte]](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      val bytes = if (v == null) Array.emptyByteArray
        else v.asInstanceOf[UTF8String].getBytes
      byteArrays(i) = bytes
      total += bytes.length
      i += 1
    }
    val all = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < byteArrays.length) {
      System.arraycopy(byteArrays(i), 0, all, off, byteArrays(i).length)
      off += byteArrays(i).length
      i += 1
    }
    Hashes.murmur3_32(all)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/**
 * Parity evaluation of a condition against (bodyJson [, intrinsics...]).
 * children: bodyJson (string, null => UNDEFINED), then optionally either
 * (id, table) or the full 8 intrinsics (id, table, signature, deleted,
 * firstIso, lastIso, mutateIso, placement).
 */
case class EmoCondEval(conditionText: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  @transient private lazy val cond: Condition = {
    val c = Conditions.fromString(conditionText)
    // the partial (body, id, table) view fabricates deleted=false and null
    // signature/timestamp/placement strings: a condition touching those
    // would silently mismatch (or NPE inside like/compare on the null) —
    // reject loudly instead, the reference's may-not-reference discipline
    if (children.length >= 3 && children.length < 9) {
      val refs = ConditionEvaluator.referencedIntrinsics(c)
      val avail = Set(graft.condition.Intrinsic.Id, graft.condition.Intrinsic.Table)
      require(refs.subsetOf(avail),
        s"intrinsic(s) ${(refs -- avail).mkString(", ")} unavailable in this " +
          "context — only ~id/~table ride with a bare body column")
    }
    c
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  private def str(input: InternalRow, i: Int): String = {
    val v = children(i).eval(input)
    if (v == null) null else v.toString
  }

  override def eval(input: InternalRow): Any = {
    val body = children.head.eval(input)
    val json = if (body == null) graft.json.JUndefined
      else JsonCodec.parse(body.asInstanceOf[UTF8String].toString)
    val intrinsics =
      if (children.length >= 9) {
        val deleted = children(4).eval(input)
        IntrinsicsView(str(input, 1), str(input, 2), str(input, 3),
          deleted != null && deleted.asInstanceOf[Boolean],
          str(input, 5), str(input, 6), str(input, 7), str(input, 8))
      } else if (children.length >= 3) {
        IntrinsicsView(str(input, 1), str(input, 2),
          null, deleted = false, null, null, null, null)
      } else null
    ConditionEvaluator.eval(cond, json, intrinsics)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/**
 * UNDEFINED-preserving field access on a JSON body (SURVEY §4.3 JsonGet /
 * JsonTypeOf): walks a dot-separated path through the JSON value and returns
 * the engine's type name at that position — "undefined" (key absent) is
 * distinct from "null" (key present, null value), the trichotomy built-in
 * JSON accessors cannot express.
 */
case class EmoJsonType(body: Expression, path: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(body, path)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    import graft.json._
    val b = body.eval(input)
    val p = path.eval(input)
    val root: JValue = if (b == null) JUndefined
      else JsonCodec.parse(b.asInstanceOf[UTF8String].toString)
    var v = root
    if (p != null) {
      p.toString.split('.').filter(_.nonEmpty).foreach { key =>
        v = v match {
          case o: JObj => o.get(key)
          case _       => JUndefined
        }
      }
    }
    UTF8String.fromString(v match {
      case JUndefined   => "undefined"
      case JNull        => "null"
      case _: JBool     => "bool"
      case _: JLong     => "num"
      case _: JDouble   => "num"
      case _: JString   => "string"
      case _: JArr      => "array"
      case _: JObj      => "object"
    })
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(body = c(0), path = c(1))
}

/** Field access returning the value at a dot-path as canonical JSON text
  * (null when undefined — pair with [[EmoJsonType]] to distinguish). */
case class EmoJsonGet(body: Expression, path: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(body, path)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    import graft.json._
    val b = body.eval(input)
    val p = path.eval(input)
    if (b == null) return null
    var v: JValue = JsonCodec.parse(b.asInstanceOf[UTF8String].toString)
    if (p != null) {
      p.toString.split('.').filter(_.nonEmpty).foreach { key =>
        v = v match {
          case o: JObj => o.get(key)
          case _       => JUndefined
        }
      }
    }
    if (v eq JUndefined) null else UTF8String.fromString(JsonCodec.render(v))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(body = c(0), path = c(1))
}

/** JSON text -> O-Rison text (the reference's audit-parameter encoding,
  * RisonHelper.asORison). Canonical: object keys sort, so the output is a
  * pure function of the JSON value. */
case class ToORisonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.json.Rison.encodeORison(
      JsonCodec.parse(input.asInstanceOf[UTF8String].toString)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** O-Rison text -> canonical JSON text (RisonHelper.fromORison): lets
  * reference-style audit strings flow into every JSON-consuming operator. */
case class FromORisonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(JsonCodec.render(
      graft.json.Rison.decodeORison(input.asInstanceOf[UTF8String].toString)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object expressions {
  import org.apache.spark.sql.GraftBridge

  private def toExpr(c: Column): Expression = GraftBridge.expression(c)
  private def toCol(e: Expression): Column = GraftBridge.column(e)

  /** murmur3_32 over the concatenated UTF-8 bytes of the given string columns. */
  def emoHash32(cols: Column*): Column = toCol(EmoHash32(cols.map(toExpr)))

  /** Java Math.abs parity for a 32-bit hash: Spark's checked abs THROWS
    * ARITHMETIC_OVERFLOW on Int.MinValue under ANSI (the Spark 4 default)
    * while the reference's Java abs returns MIN_VALUE unchanged — a key
    * hashing to MIN_VALUE (certain at placement scale) would otherwise
    * kill every partition-hashing scan/write that touches the row. The
    * when-guard keeps the checked abs off the MIN branch. */
  private[graft] def absJava(h: Column): Column = {
    import org.apache.spark.sql.functions._
    when(h === Int.MinValue, lit(Int.MinValue)).otherwise(abs(h))
  }

  /** Document partition id: abs(murmur3_32(table ++ id)) % n + 1 (Java int
    * abs — [[graft.json.Hashes.partitionOf]] parity, MIN_VALUE included). */
  def emoPartition(table: Column, id: Column, n: Int): Column =
    (absJava(emoHash32(table, id)) % n) + 1

  /** Row-key shard id (low bits of the key hash): scan-order parity.
    * Bitmask like [[graft.json.Hashes.shardId]], not `%` — identical for
    * the power-of-two shard counts the row-key format uses, and the mask
    * is MIN_VALUE-safe by construction. */
  def emoShard(table: Column, key: Column, numShards: Int = 16): Column =
    absJava(emoHash32(table, key))
      .bitwiseAND(org.apache.spark.sql.functions.lit(numShards - 1))

  /** Sortable scan-order key: (shard-hex, table, key) — byte order parity
    * with the reference's shard-prefixed row keys (RowKeyUtils.java:41-70). */
  def emoRowKey(table: Column, key: Column, numShards: Int = 16): Column = {
    import org.apache.spark.sql.functions._
    concat(format_string("%02x", emoShard(table, key, numShards)), lit("/"), table, lit("/"), key)
  }

  /** Exact-parity condition evaluation on a JSON body column. */
  def emoCondEval(conditionText: String, body: Column): Column =
    toCol(EmoCondEval(conditionText, Seq(toExpr(body))))

  def emoCondEval(conditionText: String, body: Column, id: Column, table: Column): Column =
    toCol(EmoCondEval(conditionText, Seq(toExpr(body), toExpr(id), toExpr(table))))

  /** Engine type name at a dot-path: "undefined" when the key is absent,
    * "null" when present-and-null — the trichotomy get_json_object loses. */
  def emoJsonType(body: Column, path: String): Column =
    toCol(EmoJsonType(toExpr(body), toExpr(org.apache.spark.sql.functions.lit(path))))

  /** Canonical-JSON value at a dot-path (null if undefined). */
  def emoJsonGet(body: Column, path: String): Column =
    toCol(EmoJsonGet(toExpr(body), toExpr(org.apache.spark.sql.functions.lit(path))))

  /** JSON text -> O-Rison audit encoding, and back (canonical JSON out). */
  def toORison(json: Column): Column = toCol(ToORisonExpr(toExpr(json)))
  def fromORison(orison: Column): Column = toCol(FromORisonExpr(toExpr(orison)))

  /** Full-intrinsics variant (doc frames). */
  def emoCondEvalFull(conditionText: String, body: Column, id: Column, table: Column,
                      signature: Column, deleted: Column, firstIso: Column,
                      lastIso: Column, mutateIso: Column, placement: Column): Column =
    toCol(EmoCondEval(conditionText, Seq(body, id, table, signature, deleted,
      firstIso, lastIso, mutateIso, placement).map(toExpr)))
}
