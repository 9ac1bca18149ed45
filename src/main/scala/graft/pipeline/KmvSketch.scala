package graft.pipeline

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (k-minimum-values) distinct-count sketch as a merge-able Catalyst
 * aggregate — the distributed cardinality estimator (Bar-Yossef et al.
 * 2002; unbiased (k−1)/M_k estimator from Beyer et al., SIGMOD 2007).
 *
 * Each partition keeps only the k smallest (unsigned) xxhash64 values of
 * the column — O(k) state — so partial aggregation map-side-combines and
 * merge is a bounded set union: raw values never cross the shuffle, which
 * is the whole point at 100 TB (distinct URLs per domain, distinct users
 * per segment, …). Spark's own approx_count_distinct (HLL++) serves the
 * same need; KMV is implemented here as the engine's demonstration of a
 * custom TypedImperativeAggregate (buffer, merge, serialize), and has one
 * property HLL lacks that the oracle exploits: with fewer than k distinct
 * inputs the sketch IS the distinct set, so the estimate is EXACT, not
 * approximate.
 *
 * Deterministic by construction: the k-min set is partitioning- and
 * order-invariant, so estimates are reproducible across cluster layouts
 * (spec-pinned).
 */
object Kmv {

  /** Aggregate Column: distinct-count estimate (exact while the true
    * distinct count stays below `k`). Supports long/int/string inputs. */
  def distinctCount(c: Column, k: Int = 65536): Column =
    GraftBridge.column(
      KmvDistinct(GraftBridge.expression(c), k).toAggregateExpression())

  /** Aggregate Column: the sketch ITSELF — struct<k, mins> with the
    * sorted k-min hash array — the mergeable value [[setCounts]]
    * combines, so overlap audits between two corpora (old vs new
    * snapshot URL sets, per-source user bases) run in ONE pass each and
    * combine driver-side in O(k). The sketch CARRIES its capacity: a
    * combiner cannot misread a saturated small-k sketch as a complete
    * set (the silent-wrong-answer mode a bare hash array invites). */
  def sketch(c: Column, k: Int = 65536): Column =
    GraftBridge.column(
      KmvSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Scalar Column over two [[sketch]] values: struct<n_a, n_b, n_union,
    * n_intersect> distinct-count estimates (Beyer et al., SIGMOD 2007
    * §4: union from the merged k-min set at the smaller of the two
    * capacities, intersection via the Jaccard fraction within it).
    * EXACT whenever both sketches are below their capacities — they then
    * ARE the complete hash sets — which is the regime the oracle pins.
    * Mixed capacities combine correctly (effective k = min). */
  def setCounts(a: Column, b: Column): Column =
    GraftBridge.column(KmvSetCountsExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Bounded set of the k smallest hashes, unsigned order. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      if (set.add(h)) set.pollLast()
      ()
    }
  }
}

/** Shared buffer/merge/serde plumbing for the KMV aggregates — the two
  * concrete shapes differ only in what `eval` returns (estimate vs the
  * sketch itself). */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvBuffer]
    with UnaryLike[Expression] {

  def k: Int

  override def nullable: Boolean = false

  protected def hashOf(v: Any): Long = child.dataType match {
    case LongType    => XXH64.hashLong(v.asInstanceOf[Long], 42L)
    case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, 42L)
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
    case other => throw new IllegalArgumentException(
      s"kmv_distinct: unsupported input type $other (long/int/string)")
  }

  // validated here, NOT in the constructor: Java deserialization on
  // executors instantiates the expression before its fields are restored,
  // so a constructor-time require sees k = 0 and kills the task
  override def createAggregationBuffer(): KmvBuffer = {
    require(k >= 16, s"KMV needs k >= 16, got $k")
    new KmvBuffer(k)
  }

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(hashOf(v))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.set.forEach(h => buffer.add(h))
    buffer
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    buffer.set.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }
}

/** The (k−1)/M_k distinct-count estimate; exact below capacity. */
object KmvEstimate {
  def apply(kthMinUnsigned: Long, size: Int, k: Int): Long =
    if (size < k) size.toLong // complete distinct set: exact
    else {
      // theta = k-th smallest hash normalized to (0,1]; top 53 bits keep
      // full double precision
      val theta = (kthMinUnsigned >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / math.max(theta, java.lang.Double.MIN_NORMAL))
    }
}

case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def eval(buffer: KmvBuffer): Any =
    if (buffer.set.isEmpty) 0L
    else KmvEstimate(buffer.set.last, buffer.set.size, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** The sketch as a VALUE: struct<k, mins> with the sorted (unsigned)
  * k-min hash array, ready for [[KmvSetCountsExpr]] or cross-run
  * persistence. Capacity rides in the value so downstream combiners can
  * tell "complete set of 512 values" from "saturated k=512 sketch". */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def dataType: DataType = KmvSketchAgg.SketchType
  override def prettyName: String = "kmv_sketch"

  override def eval(buffer: KmvBuffer): Any = {
    val out = new Array[Long](buffer.set.size)
    var i = 0
    buffer.set.forEach { h => out(i) = h; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](k, new org.apache.spark.sql.catalyst.util.GenericArrayData(out)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** struct<k, mins>: capacity + sorted (unsigned) k-min hashes. */
  val SketchType: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("mins", ArrayType(LongType, containsNull = false), nullable = false)))
}

/** Combine two KMV sketches into struct<n_a, n_b, n_union, n_intersect>
  * distinct-count estimates. Union: the k' smallest of the merged hash
  * sets (k' = the smaller input capacity) with the standard (k'−1)/M_k'
  * estimator; intersection: the Jaccard fraction of shared hashes within
  * that merged k'-min set, scaled by the union estimate (Beyer et al.,
  * SIGMOD 2007). When BOTH inputs are below their capacities the
  * sketches are complete hash sets and every output is exact — the
  * oracle-pinned regime. Capacities ride inside the sketch values, so a
  * saturated small-k sketch can never be misread as a complete set. One
  * O(|a|+|b|) merge walk per row. */
case class KmvSetCountsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("n_union", LongType, nullable = false),
    StructField("n_intersect", LongType, nullable = false)))
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val ra = aAny.asInstanceOf[InternalRow]
    val rb = bAny.asInstanceOf[InternalRow]
    val kA = ra.getInt(0)
    val kB = rb.getInt(0)
    val a = ra.getArray(1).toLongArray()
    val b = rb.getArray(1).toLongArray()
    val nA = if (a.isEmpty) 0L else KmvEstimate(a(a.length - 1), a.length, kA)
    val nB = if (b.isEmpty) 0L else KmvEstimate(b(b.length - 1), b.length, kB)
    val bothExact = a.length < kA && b.length < kB
    // merge walk in unsigned order over the two sorted arrays; for the
    // exact regime keep the WHOLE union, otherwise only the k' smallest
    // (k' = min capacity — hashes past the smaller sketch's threshold
    // are not comparable across the two)
    val kEff = math.min(kA, kB)
    val cap = if (bothExact) a.length + b.length else kEff
    var i = 0; var j = 0; var u = 0; var common = 0
    var lastU = 0L
    while (u < cap && (i < a.length || j < b.length)) {
      val takeA = j >= b.length ||
        (i < a.length && java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
      val h = if (takeA) a(i) else b(j)
      if (takeA && j < b.length && a(i) == b(j)) { common += 1; j += 1 }
      if (takeA) i += 1 else j += 1
      lastU = h; u += 1
    }
    val nUnion =
      if (bothExact) u.toLong
      else KmvEstimate(lastU, u, kEff)
    val nIntersect =
      if (bothExact) common.toLong
      else if (u == 0) 0L
      else math.round(common.toDouble / u * nUnion)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nA, nB, nUnion, nIntersect))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
