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

case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 16, s"KMV needs k >= 16, got $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  private def hashOf(v: Any): Long = child.dataType match {
    case LongType    => XXH64.hashLong(v.asInstanceOf[Long], 42L)
    case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, 42L)
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
    case other => throw new IllegalArgumentException(
      s"kmv_distinct: unsupported input type $other (long/int/string)")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(hashOf(v))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.set.forEach(h => buffer.add(h))
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val n = buffer.set.size
    if (n < k) n.toLong // sketch holds the whole distinct set: exact
    else {
      // theta = k-th smallest hash normalized to (0,1]; top 53 bits keep
      // full double precision
      val theta = (buffer.set.last >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / math.max(theta, java.lang.Double.MIN_NORMAL))
    }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
