package graft.pipeline

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * KLL-style quantile sketch as a merge-able Catalyst aggregate (Karnin,
 * Lang, Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016;
 * derandomized compaction parity per Ivkin et al. 2019).
 *
 * The scale story: [[Stats.exactQuantiles]] is histogram-first — its
 * shuffle is bounded by the number of DISTINCT values, which is the right
 * tool for token counts (thousands of distinct lengths) but ruinous for
 * open numeric domains (latencies, byte sizes, scores: distinct ≈ rows).
 * The KLL sketch keeps O(capacity · log(n/capacity)) state per partial
 * buffer, partials map-side-combine, and the shuffle carries sketches,
 * not values — the same mergeable-summaries shape as [[Kmv]] and
 * [[TopKSketch]].
 *
 * Guarantees, in the house sketch style:
 *  - EXACT below capacity (the oracle regime): while the total weight
 *    stays ≤ capacity every value sits uncompacted at level 0, so the
 *    reported quantile equals [[Stats.exactQuantiles]]'s discrete
 *    definition (min value whose cumulative count ≥ ceil(q/1000·n)) —
 *    and merging exact partials whose sizes sum ≤ capacity stays exact,
 *    under any partitioning.
 *  - Above capacity: rank error bounded ~ levels/capacity of n
 *    (spec-pinned with a loose tolerance). Compaction parity alternates
 *    deterministically per level (no RNG — reproducible given the same
 *    merge tree), but as with every practical quantile sketch
 *    (GK/t-digest/KLL) the summary above capacity is merge-order
 *    dependent; only the BOUNDS are invariant.
 *  - Total weight is preserved exactly through compaction (odd leftover
 *    items stay at their level), so the reported n is the true count.
 *
 * Weights are powers of two: a level-i item stands for 2^i original rows.
 */
object QuantileSketch {

  /** Aggregate Column: array<struct<q_permille:int, value:long>> of
    * discrete quantiles at the requested permilles. Long/int inputs. */
  def quantiles(c: Column, permilles: Seq[Int], capacity: Int = 4096): Column = {
    require(permilles.nonEmpty && permilles.forall(p => p > 0 && p <= 1000),
      s"permilles must be in (0, 1000]: $permilles")
    GraftBridge.column(
      KllQuantiles(GraftBridge.expression(c), permilles, capacity)
        .toAggregateExpression())
  }
}

/** Levelled compactor: levels(i) holds items of weight 2^i; level 0 is
  * kept SORTED only at compaction/eval time. */
final class KllBuffer(val k: Int) {
  val levels = ArrayBuffer(new ArrayBuffer[Long]())
  /** per-level compaction parity (flipped each compaction — the
    * derandomized coin). */
  val parity = ArrayBuffer(false)

  def insert(v: Long): Unit = {
    levels(0) += v
    if (levels(0).length > k) compact(0)
  }

  /** Sort level i, promote alternate items of an even-sized prefix to
    * level i+1 (weight doubles), keep the odd leftover — total weight is
    * preserved exactly. Cascades if the promotion overflows i+1. */
  def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) { levels += new ArrayBuffer[Long](); parity += false }
    val lvl = levels(i)
    val sorted = lvl.sortInPlace()
    val m = sorted.length - (sorted.length % 2)
    val offset = if (parity(i)) 1 else 0
    parity(i) = !parity(i)
    val up = levels(i + 1)
    var j = offset
    while (j < m) { up += sorted(j); j += 2 }
    val leftover = if (m < sorted.length) Some(sorted(sorted.length - 1)) else None
    lvl.clear()
    leftover.foreach(lvl += _)
    if (up.length > k) compact(i + 1)
  }

  def totalWeight: Long = {
    var w = 0L
    var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }
}

case class KllQuantiles(child: Expression, permilles: Seq[Int], k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(k >= 64, s"KLL needs capacity >= 64, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_permille", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"

  private def longOf(v: Any): Long = child.dataType match {
    case LongType    => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case other => throw new IllegalArgumentException(
      s"kll_quantiles: unsupported input type $other (long/int/short)")
  }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(longOf(v))
    buffer
  }

  override def merge(buffer: KllBuffer, other: KllBuffer): KllBuffer = {
    var i = 0
    while (i < other.levels.length) {
      if (i >= buffer.levels.length) {
        buffer.levels += new ArrayBuffer[Long]()
        buffer.parity += false
      }
      buffer.levels(i) ++= other.levels(i)
      i += 1
    }
    // compact bottom-up so promotions land in already-reconciled levels
    i = 0
    while (i < buffer.levels.length) {
      if (buffer.levels(i).length > k) buffer.compact(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: KllBuffer): Any = {
    val n = buffer.totalWeight
    if (n == 0L) return new GenericArrayData(Array.empty[Any])
    // gather (value, weight), sort by value, walk cumulative weight
    var total = 0
    buffer.levels.foreach(l => total += l.length)
    val vs = new Array[Long](total)
    val ws = new Array[Long](total)
    var p = 0
    var i = 0
    while (i < buffer.levels.length) {
      val lvl = buffer.levels(i)
      var j = 0
      while (j < lvl.length) { vs(p) = lvl(j); ws(p) = 1L << i; p += 1; j += 1 }
      i += 1
    }
    val order = (0 until total).sortBy(vs(_))
    val out = new Array[Any](permilles.length)
    permilles.zipWithIndex.foreach { case (q, qIdx) =>
      // ceil(q/1000 * n) in EXACT integer form — the float product rounds
      // up past the true ceiling for many (q, n) pairs (q=35, n=200 →
      // 7.000000000000001 → 8), which would skip the exact-rank value in
      // the exact regime and break batch/oracle parity
      val target = (q.toLong * n + 999L) / 1000L
      var cum = 0L
      var oi = 0
      var ans = vs(order(total - 1))
      var found = false
      while (oi < total && !found) {
        cum += ws(order(oi))
        if (cum >= target) { ans = vs(order(oi)); found = true }
        oi += 1
      }
      out(qIdx) = InternalRow(q, ans)
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KllBuffer): Array[Byte] = {
    var items = 0
    buffer.levels.foreach(l => items += l.length)
    val bb = ByteBuffer.allocate(4 + buffer.levels.length * (4 + 1) + items * 8)
    bb.putInt(buffer.levels.length)
    buffer.levels.zipWithIndex.foreach { case (lvl, i) =>
      bb.putInt(lvl.length)
      bb.put(if (buffer.parity(i)) 1.toByte else 0.toByte)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val buf = new KllBuffer(k)
    var i = 0
    while (i < nLevels) {
      if (i >= buf.levels.length) { buf.levels += new ArrayBuffer[Long](); buf.parity += false }
      val m = bb.getInt
      buf.parity(i) = bb.get() == 1.toByte
      var j = 0
      while (j < m) { buf.levels(i) += bb.getLong; j += 1 }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}
