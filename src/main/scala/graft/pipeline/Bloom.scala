package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Bloom filter over 64-bit hashes, for scan-local membership prefilters.
 *
 * The recurring 100 TB shape: a membership test against a SMALL set (an
 * eval suite's n-grams, an id denylist, a stopword list) applied to a huge
 * stream. A broadcast semi-join answers it exactly but every probe row
 * still reaches the join operator; a Bloom prefilter baked into the scan
 * predicate drops ~(1 - fpp) of non-members before ANY operator boundary,
 * and the exact join then only sees true members plus the fpp sliver —
 * false positives are possible, false negatives are not, so re-verifying
 * survivors with the exact join keeps results identical.
 *
 * Bit positions use Kirsch–Mitzenmacher double hashing (i-th probe at
 * `h1 + i*h2 mod m`), which preserves the standard fpp bound without
 * rehashing the input k times. The bitset is built driver-side from the
 * small set (same collect budget as broadcasting it) and embedded in the
 * plan as expression state — at denylist sizes where the bitset itself is
 * huge, fall back to the broadcast join.
 */
object Bloom {

  /** Mutable bitset + probe count. `bits` is little-endian 64-bit words. */
  final case class Filter(bits: Array[Long], k: Int) {
    def mBits: Long = bits.length.toLong * 64L

    def add(h: Long): Unit = {
      val h2 = Bloom.remix(h) | 1L
      var i = 0
      while (i < k) {
        val idx = java.lang.Long.remainderUnsigned(h + i.toLong * h2, mBits)
        bits((idx >>> 6).toInt) |= (1L << (idx & 63L))
        i += 1
      }
    }

    def mightContain(h: Long): Boolean = {
      val h2 = Bloom.remix(h) | 1L
      var i = 0
      while (i < k) {
        val idx = java.lang.Long.remainderUnsigned(h + i.toLong * h2, mBits)
        if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** splitmix64 finalizer — decorrelates the second probe stride from h. */
  private[pipeline] def remix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Sized for `nItems` at false-positive rate `fpp` (m = -n ln p / ln²2,
    * k = m/n ln 2 — the classic optima). */
  def empty(nItems: Long, fpp: Double): Filter = {
    require(nItems > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1: $nItems, $fpp")
    val ln2 = math.log(2.0)
    val m = math.max(64L, math.ceil(-(nItems.toDouble * math.log(fpp)) / (ln2 * ln2)).toLong)
    val wordsL = (m + 63L) / 64L
    // the filter is plan-embedded state shipped inside the serialized
    // expression: past ~1 GiB that is the wrong tool (and past Int words
    // the allocation would throw NegativeArraySizeException) — fail with
    // the documented alternative instead
    require(wordsL <= (1L << 27),
      s"Bloom bitset would be ${wordsL * 8L} bytes for nItems=$nItems at fpp=$fpp " +
        "— too large for plan-embedded expression state; use the exact " +
        "broadcast semi-join instead (false negatives are impossible there too)")
    val words = wordsL.toInt
    val k = math.max(1, math.round(m.toDouble / nItems.toDouble * ln2).toInt)
    Filter(new Array[Long](words), k)
  }

  def build(hashes: IterableOnce[Long], nItems: Long, fpp: Double = 0.01): Filter = {
    val f = empty(nItems, fpp)
    hashes.iterator.foreach(f.add)
    f
  }

  /** Scan-local membership test of a long hash column against `f`. */
  def mightContain(hashCol: Column, f: Filter): Column =
    GraftBridge.column(BloomMightContainExpr(GraftBridge.expression(hashCol), f.bits, f.k))
}

/** `bits`/`k` are plan-embedded state (like PqEncodeExpr's codebooks): the
  * filter ships to executors inside the serialized expression, no broadcast
  * round-trip, and the probe is one tight loop per row. */
case class BloomMightContainExpr(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val filter = Bloom.Filter(bits, k)

  override def nullSafeEval(input: Any): Any =
    filter.mightContain(input.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
