package graft.core

import graft.delta.Deltas
import graft.json._
import graft.resolve._
import org.scalatest.funsuite.AnyFunSuite

/** The canonical fold sequence from FIXTURES.md §A1 (mirrors the reference's
  * DeltaEvaluatorTest.testTopLevelDelete + RedundantDeltaTest semantics). */
class ResolverSpec extends AnyFunSuite {

  private def cid(n: Int) = TimeUuid(1000L * n, 0, "n1")

  test("Utf8Order matches UTF-8 byte order where String order diverges") {
    import graft.resolve.Resolver
    def utf8Cmp(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      var r = 0
      while (r == 0 && i < n) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (r != 0) r else x.length - y.length
    }
    val pairs = Seq(
      ("", "😀"), // the divergence pair: PUA vs emoji
      ("abc", "abd"), ("a", "ab"), ("", "a"), ("z", "za"),
      ("￿", "𐀀"), ("tag-a", "tag-b"))
    for ((a, b) <- pairs; (x, y) <- Seq((a, b), (b, a), (a, a))) {
      assert(Integer.signum(Resolver.Utf8Order.compare(x, y)) ===
        Integer.signum(utf8Cmp(x, y)), s"pair ($x, $y)")
    }
    // and the DEFAULT String order really does diverge on the boundary —
    // which is why the JVM fold sides must use Utf8Order, matching the
    // batch fold's Tungsten sort
    assert(Resolver.Utf8Order.compare("", "😀") < 0)
    assert(Ordering.String.compare("", "😀") > 0)
    // joinTags canonical form follows it
    assert(Resolver.joinTags(Set("😀", ""))
      .startsWith(""))
  }

  test("canonical sequence: create, update, redundant, delete, resurrect") {
    val r = new Resolver("review:testcustomer", "demo1", "ugc_global:ugc")

    assert(!r.update(cid(1), Deltas.fromString("""{"name":"Bob","rating":3}"""), Set.empty))
    var doc = r.result()
    assert(doc.content === JsonCodec.parse("""{"name":"Bob","rating":3}"""))
    assert(doc.version === 1 && !doc.deleted)

    assert(!r.update(cid(2), Deltas.fromString("""{..,"rating":4}"""), Set.empty))
    doc = r.result()
    assert(doc.content === JsonCodec.parse("""{"name":"Bob","rating":4}"""))
    assert(doc.version === 2)

    // same delta again: content unchanged, same tags => redundant
    assert(r.update(cid(3), Deltas.fromString("""{..,"rating":4}"""), Set.empty))
    doc = r.result()
    assert(doc.version === 3 && doc.redundantChanges === 1)
    // lastMutateAt stays at the actual mutation
    assert(doc.lastMutateAt === cid(2))
    assert(doc.lastUpdateAt === cid(3))

    // delete
    assert(!r.update(cid(4), Deltas.delete, Set.empty))
    doc = r.result()
    assert(doc.deleted && doc.version === 4)

    // update racing delete wins going forward
    assert(!r.update(cid(5), Deltas.fromString("""{..,"state":"APPROVED"}"""), Set.empty))
    doc = r.result()
    assert(doc.content === JsonCodec.parse("""{"state":"APPROVED"}"""))
    assert(!doc.deleted && doc.version === 5)
    assert(doc.firstUpdateAt === cid(1))
  }

  test("redundant delta with different tags is NOT redundant") {
    val r = new Resolver("t", "k", "p")
    r.update(cid(1), Deltas.fromString("""{"x":1}"""), Set("a"))
    // same content, different tags => not redundant (tag listeners must see it)
    assert(!r.update(cid(2), Deltas.fromString("""{"x":1}"""), Set("b")))
    // same content, same tags => redundant
    assert(r.update(cid(3), Deltas.fromString("""{"x":1}"""), Set("b")))
  }

  test("first delta is a delete: lastMutateAt still set") {
    val r = new Resolver("t", "k", "p")
    r.update(cid(1), Deltas.delete, Set.empty)
    val doc = r.result()
    assert(doc.deleted && doc.lastMutateAt === cid(1))
  }

  test("signature chains and differs per change path") {
    val r1 = new Resolver("t", "k", "p")
    r1.update(cid(1), Deltas.fromString("1"), Set.empty)
    val s1 = r1.result().signature
    r1.update(cid(2), Deltas.fromString("2"), Set.empty)
    val s2 = r1.result().signature
    assert(s1 !== s2)
    val r2 = new Resolver("t", "k", "p")
    r2.update(cid(1), Deltas.fromString("1"), Set.empty)
    assert(r2.result().signature === s1)
  }

  test("toContentJson canonical form: intrinsics first, sorted keys") {
    val r = new Resolver("tbl", "key1", "p0")
    r.update(TimeUuid(1350000000000L, 0, "n"), Deltas.fromString("""{"b":2,"a":1}"""), Set.empty)
    val json = r.result().toContentJson
    assert(json.startsWith("""{"~deleted":false,"~firstUpdateAt":"""))
    assert(json.contains(""""~id":"key1""""))
    assert(json.endsWith(""""a":1,"b":2}"""))
  }

  test("conditional delta sees intrinsics mid-fold") {
    val r = new Resolver("tbl", "key1", "p0")
    r.update(cid(1), Deltas.fromString("""{"x":1}"""), Set.empty)
    r.update(cid(2), Deltas.fromString("""if intrinsic("~table":"tbl") then {..,"y":2} end"""), Set.empty)
    assert(r.result().content === JsonCodec.parse("""{"x":1,"y":2}"""))
  }

  test("FUZZ: ISO-8601 intrinsic timestamps roundtrip epoch millis exactly") {
    // the ~firstUpdateAt/~lastUpdateAt/~lastMutateAt wire strings must be
    // loss-free: a conditional delta comparing them re-parses the format
    val rnd = new scala.util.Random(1212)
    val edges = Seq(0L, 1L, -1L, 999L, 1000L, -999L,
      253402300799999L /* 9999-12-31T23:59:59.999Z */, -62135596800000L)
    val samples = edges ++ Seq.fill(2000)(math.abs(rnd.nextLong()) % 253402300799999L)
    samples.foreach { ms =>
      val s = Iso8601.format(ms)
      assert(Iso8601.parseMs(s) === ms, s"roundtrip of $ms via <$s>")
      assert(s.endsWith("Z") && s.charAt(10) == 'T', s"shape: <$s>")
    }
  }
}
