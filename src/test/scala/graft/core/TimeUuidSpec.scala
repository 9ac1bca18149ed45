package graft.core

import graft.json.{Hashes, TimeUuid}
import org.scalatest.funsuite.AnyFunSuite

/**
 * RFC-4122 version-1 byte-layout parity with the reference's fabricated
 * time UUIDs (common/uuid/.../TimeUUIDs.java) — golden values computed from
 * the published algorithm (msb scatter at TimeUUIDs.java:103-110, lsb at
 * 116-119, raw timestamp at 125-129), plus ordering and signature-chain
 * goldens.
 */
class TimeUuidSpec extends AnyFunSuite {

  test("golden v1 msb/lsb values match the reference algorithm") {
    // epoch, zero sequence, zero node
    val t0 = TimeUuid(0L, 0L, "000000000000")
    assert(t0.v1Msb === 1405474927960789426L)
    assert(t0.v1Lsb === -9223372036854775808L)
    assert(t0.v1Uuid.toString === "13814000-1dd2-11b2-8000-000000000000")
    // a 2023 timestamp: lands in the familiar -11ee- v1 range
    val t1 = TimeUuid(1700000000000L, 5L, "123456789abc")
    assert(t1.v1Msb === 337699605510296046L)
    assert(t1.v1Lsb === -9221944645972878660L)
    assert(t1.v1Uuid.toString === "04afc000-833b-11ee-8005-123456789abc")
    // clock_seq and node saturated
    val t2 = TimeUuid(1234567890123L, 16383L, "ffffffffffff")
    assert(t2.v1Msb === 8137012427769647581L)
    assert(t2.v1Lsb === -4611686018427387905L)
    assert(t2.v1Uuid.toString === "70ec79b0-fa26-11dd-bfff-ffffffffffff")
  }

  test("v1 UUIDs carry version 1, variant 2, and round-trip timestamp/seq/node") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val ms = math.abs(rnd.nextLong() % 4000000000000L) // within UUID time bounds
      val seq = rnd.nextLong() & 0x3fffL
      val node = f"${rnd.nextLong() & 0xffffffffffffL}%012x"
      val t = TimeUuid(ms, seq, node)
      val u = t.v1Uuid
      assert(u.version() === 1)
      assert(u.variant() === 2)
      assert(u.timestamp() === TimeUuid.rawTimestamp(ms))
      assert(TimeUuid.fromV1(u) === t)
    }
  }

  test("struct ordering matches the reference UUID ordering for hex nodes") {
    // TimeUUIDs.compare: timestamp first, then UUID.compareTo (msb, lsb as
    // signed longs). For canonical nodes the struct order must agree.
    val rnd = new scala.util.Random(42)
    val ids = Seq.fill(300) {
      TimeUuid(rnd.nextInt(3) * 1000L + 1700000000000L,
        rnd.nextInt(4).toLong, f"${rnd.nextLong() & 0xffffffffffffL}%012x")
    }.distinct
    def refCompare(a: TimeUuid, b: TimeUuid): Int = {
      val ua = a.v1Uuid; val ub = b.v1Uuid
      val ct = java.lang.Long.compare(ua.timestamp(), ub.timestamp())
      if (ct != 0) ct else ua.compareTo(ub)
    }
    val bySpec = ids.sorted
    val byRef = ids.sortWith((a, b) => refCompare(a, b) < 0)
    assert(bySpec === byRef)
  }

  test("signature chain goldens over v1 bytes") {
    // md5(zero16 ++ uuidBytes) then chained — values pinned from the
    // reference algorithm (DefaultResolver.java:127-132 + UUIDs.asByteArray)
    val c1 = TimeUuid(1700000000000L, 5L, "123456789abc")
    val sig1 = Hashes.chainSignature(Hashes.SignatureZero, c1.bytes)
    assert(Hashes.toHex(sig1) === "6efb2d6d009874f80093ef584627701b")
    val c2 = TimeUuid(1700000000001L, 0L, "123456789abc")
    val sig2 = Hashes.chainSignature(sig1, c2.bytes)
    assert(Hashes.toHex(sig2) === "519cf860be9cb02f1950ec33ecf0e200")
  }

  test("minimum/maximum UUIDs bound all fabricated v1 UUIDs") {
    val min = TimeUuid.minimumUuid
    val max = TimeUuid.maximumUuid
    assert(min.toString === "00000000-0000-1000-8000-000000000000")
    assert(max.toString === "ffffffff-ffff-1fff-bfff-ffffffffffff")
    def refCompare(a: java.util.UUID, b: java.util.UUID): Int = {
      val ct = java.lang.Long.compare(a.timestamp(), b.timestamp())
      if (ct != 0) ct else a.compareTo(b)
    }
    val samples = Seq(
      TimeUuid(0L, 0L, "000000000000"),
      TimeUuid(1700000000000L, 5L, "123456789abc"),
      TimeUuid(TimeUuid.TimeMillisMax, 16383L, "ffffffffffff"))
    samples.foreach { t =>
      assert(refCompare(min, t.v1Uuid) <= 0)
      assert(refCompare(max, t.v1Uuid) >= 0)
    }
  }

  test("getNext/getPrevious parity: adjacent UUIDs and field rollover") {
    val u = TimeUuid(1700000000000L, 5L, "123456789abc").v1Uuid
    val next = TimeUuid.v1Next(u)
    assert(next.getMostSignificantBits === u.getMostSignificantBits)
    assert(next.getLeastSignificantBits === u.getLeastSignificantBits + 1)
    assert(TimeUuid.v1Previous(next) === u)
    // lsb at max rolls the timestamp forward
    val atLsbMax = new java.util.UUID(u.getMostSignificantBits,
      TimeUuid.maximumUuid.getLeastSignificantBits)
    val rolled = TimeUuid.v1Next(atLsbMax)
    assert(rolled.timestamp() === atLsbMax.timestamp() + 1)
    assert(rolled.getLeastSignificantBits ===
      TimeUuid.minimumUuid.getLeastSignificantBits)
    // the extremes return null
    assert(TimeUuid.v1Next(TimeUuid.maximumUuid) === null)
    assert(TimeUuid.v1Previous(TimeUuid.minimumUuid) === null)
  }

  test("free-form node strings map deterministically through md5") {
    // md5("n") = 7b8b965a d4bc... -> first 6 bytes are the node id
    assert(TimeUuid.node48("n") === java.lang.Long.parseLong("7b8b965ad4bc", 16))
    assert(TimeUuid.node48("n") === TimeUuid.node48("n"))
    assert(TimeUuid.node48("a") !== TimeUuid.node48("b"))
    // canonical hex nodes parse as themselves
    assert(TimeUuid.node48("0000000000ff") === 255L)
  }
}
