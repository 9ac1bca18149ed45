package graft.core

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

class JsonCoreSpec extends AnyFunSuite {

  test("parse/render round trip with canonical key order") {
    val v = JsonCodec.parse("""{"b":1,"a":[1,2.5,"x",null,true],"~id":"k"}""")
    assert(JsonCodec.render(v) === """{"~id":"k","a":[1,2.5,"x",null,true],"b":1}""")
  }

  test("long vs double distinguished") {
    assert(JsonCodec.parse("3") === JLong(3))
    assert(JsonCodec.parse("3.0") === JDouble(3.0))
    assert(JsonCodec.parse("3") !== JsonCodec.parse("3.0"))
    assert(JsonCodec.parse("-3.2e14") === JDouble(-3.2e14))
    assert(JsonCodec.render(JDouble(-3.2e14)) === "-3.2E14")
  }

  test("string escapes") {
    val s = JsonCodec.parse("\"a\\\"b\\u0105\\n\"")
    assert(s === JString("a\"bą\n"))
    assert(JsonCodec.render(s) === "\"a\\\"bą\\n\"")
  }

  test("map equality is order-insensitive; list order-sensitive") {
    assert(JsonCodec.parse("""{"a":1,"b":2}""") === JsonCodec.parse("""{"b":2,"a":1}"""))
    assert(JsonCodec.parse("""[1,2]""") !== JsonCodec.parse("""[2,1]"""))
  }

  test("cross-type ordering: null < bool < list < map < number < string") {
    val sorted = Seq(JString("a"), JLong(1), JNull, JBool(true),
      JArr(Vector(JLong(1))), JObj(Map("k" -> JLong(1)))).sorted(JValue.CrossTypeOrdering)
    assert(sorted === Seq(JNull, JBool(true), JArr(Vector(JLong(1))),
      JObj(Map("k" -> JLong(1))), JLong(1), JString("a")))
  }

  test("numeric ordering promotes long/double") {
    assert(JValue.CrossTypeOrdering.compare(JLong(2), JDouble(2.5)) < 0)
    assert(JValue.CrossTypeOrdering.compare(JDouble(2.5), JLong(3)) < 0)
    assert(JValue.CrossTypeOrdering.compare(JLong(3), JDouble(3.0)) === 0)
    // long-vs-long avoids double rounding
    assert(JValue.CrossTypeOrdering.compare(JLong(Long.MaxValue), JLong(Long.MaxValue - 1)) > 0)
  }

  test("murmur3_32 known public vectors (x86_32, seed 0)") {
    assert(Hashes.murmur3_32("") === 0)
    assert(Hashes.murmur3_32("a") === 0x3c2569b2)
    assert(Hashes.murmur3_32("abc") === 0xb3dd93fa)
    assert(Hashes.murmur3_32("Hello, world!") === 0xc0363e43)
  }

  test("partition hash is stable and in range") {
    val p = Hashes.partitionOf("review:testcustomer", "demo1", 8)
    assert(p >= 1 && p <= 8)
    assert(p === Hashes.partitionOf("review:testcustomer", "demo1", 8))
    // concatenation, not per-string hashing
    assert(Hashes.murmur3_32Concat("ab", "c") === Hashes.murmur3_32("abc"))
  }

  test("chained md5 signature") {
    val sig1 = Hashes.chainSignature(Hashes.SignatureZero, TimeUuid(1000, 1, "n1").bytes)
    val sig2 = Hashes.chainSignature(sig1, TimeUuid(2000, 1, "n1").bytes)
    assert(sig1.length === 16 && sig2.length === 16)
    assert(Hashes.toHex(sig1) !== Hashes.toHex(sig2))
    // deterministic
    assert(Hashes.toHex(sig2) ===
      Hashes.toHex(Hashes.chainSignature(Hashes.chainSignature(Hashes.SignatureZero,
        TimeUuid(1000, 1, "n1").bytes), TimeUuid(2000, 1, "n1").bytes)))
  }

  test("timeuuid total order and text round trip") {
    val a = TimeUuid(1000, 1, "a")
    val b = TimeUuid(1000, 1, "b")
    val c = TimeUuid(1000, 2, "a")
    val d = TimeUuid(1001, 0, "a")
    assert(Seq(d, c, b, a).sorted === Seq(a, b, c, d))
    assert(TimeUuid.parse(a.toString) === a)
  }

  test("FUZZ: CrossTypeOrdering satisfies the comparator contract") {
    // every sorted set delta and printed value set goes through a TreeSet
    // over this ordering — an antisymmetry or transitivity violation
    // corrupts them silently. Longs stay within +-2^53: past that, the
    // reference's own rule (LiteralImpl.java:107 — mixed numeric pairs
    // compare as doubles) makes distinct longs compare equal to one double,
    // a DELIBERATE parity choice this engine reproduces; inside 2^53 the
    // contract must hold exactly.
    val ord = JValue.CrossTypeOrdering
    val pool = Vector("", "a", "b", "ab", "z")
    def gen(r: scala.util.Random, depth: Int): JValue =
      r.nextInt(if (depth <= 0) 6 else 8) match {
        case 0 => JNull
        case 1 => JBool(r.nextBoolean())
        case 2 => JLong(r.nextLong() >> 11) // within +-2^53
        case 3 => JDouble(math.floor(r.nextDouble() * 100) / 4.0)
        case 4 => JLong(r.nextInt(8))
        case 5 => JDouble(r.nextInt(8))     // integral doubles collide with longs
        case 6 => JArr(Vector.fill(r.nextInt(3))(gen(r, depth - 1)))
        case _ => JObj(Seq.fill(r.nextInt(3))(
          pool(r.nextInt(pool.size)) -> gen(r, depth - 1)).toMap)
      }
    def sgn(i: Int) = Integer.signum(i)
    for (seed <- 1 to 3000) {
      val r = new scala.util.Random(seed)
      val a = gen(r, 2); val b = gen(r, 2); val c = gen(r, 2)
      assert(ord.compare(a, a) === 0, s"irreflexive: $a")
      assert(sgn(ord.compare(a, b)) === -sgn(ord.compare(b, a)), s"asym: $a vs $b")
      if (ord.compare(a, b) <= 0 && ord.compare(b, c) <= 0)
        assert(ord.compare(a, c) <= 0, s"transitivity: $a <= $b <= $c")
      // equality consistency: compare==0 must behave like an equivalence
      if (ord.compare(a, b) == 0 && ord.compare(b, c) == 0)
        assert(ord.compare(a, c) === 0, s"equiv: $a == $b == $c")
    }
  }
}
