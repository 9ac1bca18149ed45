package graft.pipeline

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SpaceSaving heavy-hitters sketch as a merge-able Catalyst aggregate
 * (Metwally et al., "Efficient Computation of Frequent and Top-k Elements
 * in Data Streams", ICDT 2005; merge rule from Agarwal et al., "Mergeable
 * Summaries", PODS 2012).
 *
 * The scale story: exact token frequency over a 100 TB corpus shuffles a
 * vocabulary-sized aggregate — fine for bounded vocabularies, ruinous for
 * open ones (URLs, n-grams, user ids). SpaceSaving keeps a FIXED
 * `capacity` of counters per partial buffer, so partial aggregation
 * map-side-combines with O(capacity) state and the shuffle carries
 * sketches, not items. Guarantees (spec-pinned): every reported count
 * OVERestimates the true count by at most its reported `err`, any item
 * with true frequency > N/capacity is retained, and — the property the
 * oracle exploits, same as KMV — while the number of distinct items stays
 * below `capacity` no counter is ever evicted anywhere, so counts are
 * EXACT and err is 0.
 *
 * Above capacity the summary is arrival-order dependent (which of two
 * equal-count tails survives an eviction depends on partitioning) — the
 * BOUNDS always hold, the tail composition may vary. Exactness below
 * capacity is order-independent.
 */
object TopKSketch {

  /** Aggregate Column: array<struct<item,count,err>> of the top `n`
    * tracked items, count desc / item asc. String inputs (cast first for
    * other types — heavy hitters need the item back, not a hash). */
  def topK(c: Column, n: Int, capacity: Int = 4096): Column =
    GraftBridge.column(
      SpaceSavingTopK(GraftBridge.expression(c), n, capacity).toAggregateExpression())
}

/** item -> (count, err) with a bounded counter table.
  *
  * Eviction is O(log capacity) amortized via a LAZY min-heap of
  * (count, item) snapshots, not an O(capacity) table scan per evicting
  * row: the scan was invisible below capacity (the exact regime the
  * oracle pins) but dominated the saturated open-vocabulary regime the
  * sketch exists for — a capacity-4096 table paid 4096 comparisons for
  * EVERY distinct-item arrival past saturation. Snapshots go stale when
  * their item's count moves (or the item is evicted); stale entries are
  * discarded on pop by validating against the live table, the heap is
  * rebuilt from the table when it runs empty (also covers deserialize
  * and merge, which mutate the table directly and just clear the heap),
  * and compacted when lazy pushes outgrow 8x capacity. Victim selection
  * is IDENTICAL to the old scan: min count, ties to the LARGER item. */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Array[Long]]() // [count, err]

  private val heap = new java.util.PriorityQueue[Array[AnyRef]](
    (a: Array[AnyRef], b: Array[AnyRef]) => {
      val c = java.lang.Long.compare(a(0).asInstanceOf[java.lang.Long],
        b(0).asInstanceOf[java.lang.Long])
      if (c != 0) c
      else b(1).asInstanceOf[String].compareTo(a(1).asInstanceOf[String])
    })

  private def push(count: Long, item: String): Unit = {
    heap.add(Array[AnyRef](java.lang.Long.valueOf(count), item))
    if (heap.size > 8 * capacity) rebuildHeap()
    ()
  }

  /** Called after direct table mutation (merge/deserialize bypass add). */
  def invalidateHeap(): Unit = heap.clear()

  private def rebuildHeap(): Unit = {
    heap.clear()
    counts.forEach { (k, v) => push(v(0), k) }
  }

  /** The live minimum entry: pop stale snapshots until the top matches
    * the table; rebuild if the heap drains (lazy init / post-merge). */
  private def validMin(): Array[AnyRef] = {
    while (true) {
      if (heap.isEmpty) rebuildHeap()
      val top = heap.peek()
      val cur = counts.get(top(1).asInstanceOf[String])
      if (cur != null && cur(0) == top(0).asInstanceOf[java.lang.Long].longValue)
        return top
      heap.poll()
    }
    throw new IllegalStateException("unreachable")
  }

  /** smallest tracked count, 0 while the table is not full — the absent-
    * item bound the merge rule needs. */
  def minCount: Long =
    if (counts.size < capacity) 0L
    else validMin()(0).asInstanceOf[java.lang.Long].longValue

  def add(item: String, count: Long, err: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) { cur(0) += count; cur(1) += err; push(cur(0), item) }
    else if (counts.size < capacity) {
      counts.put(item, Array(count, err)); push(count, item)
    } else {
      val evict = validMin()
      val key = evict(1).asInstanceOf[String]
      val m = counts.get(key)(0)
      counts.remove(key)
      heap.poll() // the evicted entry is at the top (validMin peeked it)
      counts.put(item, Array(m + count, m + err))
      push(m + count, item)
    }
  }
}

case class SpaceSavingTopK(child: Expression, n: Int, capacity: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(n >= 1 && capacity >= n,
    s"need 1 <= n <= capacity (got n=$n capacity=$capacity)")

  // analysis-time typing (a constructor dataType check would fire on the
  // still-unresolved child); heavy hitters need the item back, so inputs
  // must be strings rather than hashes
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk: string input required, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buffer
  }

  /** Mergeable-summaries rule: an item absent from one side could have
    * been counted up to that side's min counter before eviction, so the
    * missing side contributes its minCount to BOTH count and err. Then the
    * combined table re-trims to capacity via the same eviction rule. */
  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (other.counts.isEmpty) return buffer
    if (buffer.counts.isEmpty) {
      other.counts.forEach((k, v) => buffer.counts.put(k, v.clone()))
      buffer.invalidateHeap()
      return buffer
    }
    val mA = buffer.minCount
    val mB = other.minCount
    val merged = new java.util.HashMap[String, Array[Long]]()
    buffer.counts.forEach { (k, v) =>
      val o = other.counts.get(k)
      if (o != null) merged.put(k, Array(v(0) + o(0), v(1) + o(1)))
      else merged.put(k, Array(v(0) + mB, v(1) + mB))
      ()
    }
    other.counts.forEach { (k, v) =>
      if (!merged.containsKey(k)) { merged.put(k, Array(v(0) + mA, v(1) + mA)); () }
    }
    // keep the capacity largest counts (ties keep smaller items, matching
    // the eviction rule's preference)
    buffer.counts.clear()
    val entries = new java.util.ArrayList(merged.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val keep = math.min(capacity, entries.size())
    var i = 0
    while (i < keep) {
      val e = entries.get(i)
      buffer.counts.put(e.getKey, e.getValue)
      i += 1
    }
    buffer.invalidateHeap() // table mutated directly; heap rebuilds lazily
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val entries = new java.util.ArrayList(buffer.counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val keep = math.min(n, entries.size())
    val rows = new Array[Any](keep)
    var i = 0
    while (i < keep) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    var size = 4
    buffer.counts.forEach { (k, _) =>
      size += 4 + k.getBytes(StandardCharsets.UTF_8).length + 16; ()
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.counts.size)
    buffer.counts.forEach { (k, v) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length); bb.put(b); bb.putLong(v(0)); bb.putLong(v(1))
      ()
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nEntries = bb.getInt
    val buf = new SpaceSavingBuffer(capacity)
    var i = 0
    while (i < nEntries) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
