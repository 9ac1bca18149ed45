package graft.core

import graft.engine.ScanRange
import org.scalatest.funsuite.AnyFunSuite

/** Conformance corpus for circular scan-range intersection, ported
  * case-for-case from the reference's sor/db ScanRangeTest. */
class ScanRangeSpec extends AnyFunSuite {

  private val a = "010000000000000064666f6f"
  private val b = "030000000000000064666f6f"
  private val c = "050000000000000064666f6f"
  private val d = "070000000000000064666f6f"
  private val e = "090000000000000064666f6f"

  private def r(from: String, to: String) = ScanRange(from, to)

  test("non-wrapping intersections") {
    assert(r(a, b).intersection(r(a, b)) === List(r(a, b)), "equality")
    assert(r(a, c).intersection(r(a, b)) === List(r(a, b)), "shared start")
    assert(r(a, c).intersection(r(b, c)) === List(r(b, c)), "shared end")
    assert(r(a, c).intersection(r(b, d)) === List(r(b, c)), "partial overlap")
    assert(r(a, b).intersection(r(c, d)) === Nil, "no overlap")
    assert(r(a, b).intersection(r(b, c)) === Nil, "shared endpoint, no overlap")
  }

  test("wrapping intersections") {
    assert(r(a, a).intersection(r(a, a)) === List(ScanRange.all),
      "complete range, same endpoint")
    assert(r(a, a).intersection(r(b, b)) === List(ScanRange.all),
      "complete range, different endpoint")
    assert(r(a, d).intersection(r(e, c)) === List(r(a, c)),
      "partial overlap with low-end")
    assert(r(a, b).intersection(r(d, c)) === List(r(a, b)),
      "complete overlap with low-end")
    assert(r(b, e).intersection(r(c, a)) === List(r(c, e)),
      "partial overlap with high-end")
    assert(r(d, e).intersection(r(c, b)) === List(r(d, e)),
      "complete overlap with high-end")
    assert(r(d, a).intersection(r(e, b)) === List(r(e, a)),
      "double overlapping with partial overlap")
    assert(r(d, b).intersection(r(e, a)) === List(r(e, a)),
      "double overlapping with complete overlap")
    assert(r(a, e).intersection(r(d, b)) === List(r(a, b), r(d, e)),
      "partial overlap on both ends")
    assert(r(b, c).intersection(r(e, a)) === Nil, "no overlap")
    assert(r(b, c).intersection(r(c, b)) === Nil, "shared endpoints, no overlap")
  }

  test("wrapped ranges with one empty piece intersect via the linear piece") {
    // [d, MIN) is formally wrapped (from >= to) but unwraps to the single
    // piece [d, MAX); the fast path must intersect the unwrapped form
    val highOnly = ScanRange(d, ScanRange.MinHex)
    assert(highOnly.unwrapped === List(ScanRange(d, ScanRange.MaxHex)))
    assert(highOnly.intersection(r(d, e)) === List(r(d, e)))
    assert(r(d, e).intersection(highOnly) === List(r(d, e)))
    assert(r(a, b).intersection(highOnly) === Nil)
    assert(highOnly.intersection(ScanRange(e, ScanRange.MinHex)) ===
      List(ScanRange(e, ScanRange.MaxHex)))
  }

  test("contains respects wrapping") {
    assert(r(a, c).contains(b))
    assert(!r(a, c).contains(d))
    assert(r(d, b).contains(e), "wrapped high side")
    assert(r(d, b).contains(a), "wrapped low side")
    assert(!r(d, b).contains(c))
    assert(ScanRange.all.contains(a) && ScanRange.all.contains(e))
  }

  test("hex comparison is unsigned byte order incl. prefixes and case") {
    assert(ScanRange.compareHex("ff", "ff00") < 0)
    assert(ScanRange.compareHex("0A", "0a") === 0)
    assert(ScanRange.compareHex("80", "7f") > 0)
    intercept[IllegalArgumentException](ScanRange.compareHex("abc", "ab"))
  }

  test("FUZZ: intersection agrees with brute-force key membership") {
    // model check over every endpoint pair from a boundary-heavy pool:
    // for each probe key, membership in intersection(A, B) must equal
    // membership in A AND membership in B. The r8 wrap-intersection bug
    // (wrapped ranges with one empty piece returning empty for real
    // intersections) is exactly the class this refutes.
    val pool = Vector(ScanRange.MinHex, "00", "01", "40", "7f", "80",
      "c0", "fe", "ff", "8000", "ff" + "00", ScanRange.MaxHex)
    val probes = Vector("", "00", "0000", "01", "3f", "40", "4001", "7f",
      "80", "8000", "80ff", "c0", "fdff", "fe", "ff", "ff00", "ffff",
      "ff" * 8, "ff" * 8 + "fe")
    var nonEmpty = 0
    for (lf <- pool; lt <- pool; rf <- pool; rt <- pool) {
      val a = ScanRange(lf, lt); val b = ScanRange(rf, rt)
      val parts = ScanRange.intersection(a, b)
      if (parts.nonEmpty) nonEmpty += 1
      for (k <- probes) {
        val expected = a.contains(k) && b.contains(k)
        assert(parts.exists(_.contains(k)) === expected,
          s"$a intersect $b = $parts wrong at key '$k' (expected $expected)")
      }
      // structural sanity: results are disjoint (no probe in two pieces)
      for (k <- probes)
        assert(parts.count(_.contains(k)) <= 1, s"$a intersect $b overlaps at '$k'")
    }
    assert(nonEmpty >= 1000, s"fuzz must bite: $nonEmpty non-empty intersections")
  }
}
