package graft.engine

/**
 * A token range over the shard-prefixed row-key space, possibly WRAPPING
 * from the high end back to the low end (SURVEY §2.1 splits; reference
 * sor/db/ScanRange.java). Ranges are half-open `[from, to)` under unsigned
 * lexicographic byte order; `from >= to` denotes a wrapped range. Split
 * tokens handed to resumable scans are ScanRanges, and re-planning a scan
 * after the split topology changes is `intersection` — the operation the
 * reference uses to resume Stash scans across ring changes.
 *
 * Keys are hex strings (even length, lowercase), the same encoding the
 * reference's JSON split tokens use. MIN is the empty key; MAX is the
 * maximal 9-byte row key (shard 0xff + table uuid 0xffffffffffffffff).
 */
final case class ScanRange(fromHex: String, toHex: String) extends Ordered[ScanRange] {
  import ScanRange._

  /** Split a wrapped range into its low and high linear pieces. */
  def unwrapped: List[ScanRange] =
    if (compareHex(fromHex, toHex) < 0) List(this)
    else
      (if (compareHex(fromHex, MaxHex) < 0) List(ScanRange(fromHex, MaxHex)) else Nil) ++
        (if (compareHex(toHex, MinHex) > 0) List(ScanRange(MinHex, toHex)) else Nil)

  def intersection(other: ScanRange): List[ScanRange] =
    ScanRange.intersection(this, other)

  /** Whether a row key (hex) falls inside this range. */
  def contains(keyHex: String): Boolean =
    unwrapped.exists(r => compareHex(keyHex, r.fromHex) >= 0 && compareHex(keyHex, r.toHex) < 0)

  override def compare(that: ScanRange): Int = compareHex(fromHex, that.fromHex)
  override def toString: String = s"ScanRange[$fromHex-$toHex]"
}

object ScanRange {
  val MinHex: String = ""
  /** shard 0xff + tableUuid 0xffffffffffffffff — the maximal row key. */
  val MaxHex: String = "ff" * 9

  def all: ScanRange = ScanRange(MinHex, MaxHex)

  /** Unsigned lexicographic byte order on hex strings: with a fixed-width
    * lowercase hex alphabet, String ordering IS unsigned byte ordering. */
  def compareHex(a: String, b: String): Int = {
    val n = normalize(a).compareTo(normalize(b))
    if (n < 0) -1 else if (n > 0) 1 else 0
  }

  private def normalize(hex: String): String = {
    require(hex.length % 2 == 0, s"odd-length hex key: $hex")
    hex.toLowerCase(java.util.Locale.ROOT) // hex is I-free, but pin the locale anyway
  }

  /**
   * Intersection of two circular ranges (ScanRange.java:96-151). Two
   * wrapped ranges can intersect in TWO disjoint pieces; results come back
   * low-to-high, contiguous pieces joined, and a contiguous
   * high-wrap-to-low pair re-combined into one wrapped range.
   */
  def intersection(left: ScanRange, right: ScanRange): List[ScanRange] = {
    val ul = left.unwrapped
    val ur = right.unwrapped
    // the UNWRAPPED pieces, not the originals: a wrapped range with one
    // empty piece (e.g. [aa, MIN) ≡ [aa, MAX), or [x, x) ≡ the full ring)
    // unwraps to a single piece that is NOT equal to itself, and feeding
    // the wrapped form to the linear intersector returns empty for real
    // intersections
    if (ul.size == 1 && ur.size == 1)
      return intersectLinear(ul.head, ur.head).toList

    var parts = (for { l <- ul; r <- ur; i <- intersectLinear(l, r) } yield i).sorted

    // join contiguous pieces (happens when one side is "all")
    var i = parts.size - 1
    var buf = parts.toBuffer
    while (i > 0) {
      if (buf(i - 1).toHex == buf(i).fromHex) {
        buf(i - 1) = ScanRange(buf(i - 1).fromHex, buf(i).toHex)
        buf.remove(i)
      }
      i -= 1
    }
    parts = buf.toList

    // a [MIN,x) + [y,MAX) pair is really the wrapped range [y,x)
    parts match {
      case List(lo, hi) if lo.fromHex == MinHex && hi.toHex == MaxHex =>
        List(ScanRange(hi.fromHex, lo.toHex))
      case other => other
    }
  }

  private def intersectLinear(a: ScanRange, b: ScanRange): Option[ScanRange] = {
    // order by starting point
    val (left, right) =
      if (compareHex(a.fromHex, b.fromHex) > 0) (b, a) else (a, b)
    if (compareHex(right.fromHex, left.fromHex) >= 0 &&
        compareHex(right.fromHex, left.toHex) < 0) {
      val end = if (compareHex(left.toHex, right.toHex) < 0) left.toHex else right.toHex
      Some(ScanRange(right.fromHex, end))
    } else None
  }
}
