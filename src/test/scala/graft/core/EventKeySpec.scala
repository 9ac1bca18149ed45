package graft.core

import graft.streaming.EventKey
import org.scalatest.funsuite.AnyFunSuite

/** Event-key codec parity with EventKeyFormat.java (prefix-compressed hex
  * id concatenation with I/X delimiters). */
class EventKeySpec extends AnyFunSuite {

  test("documented example shape: same-length shared-prefix ids compress via X") {
    // the javadoc's own "abcdef"/"abcghi" example contains non-hex chars
    // the format's validator rejects — same shape with valid hex:
    assert(EventKey.encode(Seq("abc123", "abc456")) === "abc123X456")
    assert(EventKey.decode("abc123X456") === Seq("abc123", "abc456"))
  }

  test("slab-run compression: sorted sequential counters add a few chars each") {
    val slab = "0123456789abcdef0123456789abcdef" // 32-char slab id
    val ids = Seq(slab + "0001" + "aaaa", slab + "0002" + "bbbb", slab + "0010" + "cccc")
    val key = EventKey.encode(ids)
    // 2nd id shares "...000", 3rd shares "...00"
    assert(key === ids.head + "X2bbbb" + "X10cccc")
    assert(EventKey.decode(key) === ids)
  }

  test("length change or no shared prefix falls back to the I delimiter") {
    assert(EventKey.encode(Seq("aa", "bbbb")) === "aaIbbbb")
    assert(EventKey.encode(Seq("ab", "cd")) === "abIcd")
    assert(EventKey.decode("aaIbbbb") === Seq("aa", "bbbb"))
    // after an I the prefix state resets: X then compresses vs the NEW id
    assert(EventKey.decode("aaIbbbbXccc") === Seq("aa", "bbbb", "bccc"))
    ()
  }

  test("single id is the identity; invalids rejected") {
    assert(EventKey.encode(Seq("deadbeef")) === "deadbeef")
    assert(EventKey.decode("deadbeef") === Seq("deadbeef"))
    intercept[IllegalArgumentException](EventKey.encode(Seq.empty))
    intercept[IllegalArgumentException](EventKey.encode(Seq("DEADBEEF"))) // uppercase
    intercept[IllegalArgumentException](EventKey.encode(Seq("xyz")))
    intercept[IllegalArgumentException](EventKey.encode(Seq("")))
  }

  test("PROPERTY: random sorted hex id lists roundtrip exactly") {
    val rnd = new scala.util.Random(71)
    def hexId(): String = {
      val len = 4 + rnd.nextInt(36)
      Seq.fill(len)("0123456789abcdef".charAt(rnd.nextInt(16))).mkString
    }
    (1 to 200).foreach { _ =>
      val ids = Seq.fill(1 + rnd.nextInt(8))(hexId()).sorted
      val key = EventKey.encode(ids)
      assert(EventKey.decode(key) === ids, s"roundtrip of $ids via $key")
      assert(EventKey.decodeAll(Seq(key, key)) === ids ++ ids)
    }
  }
}
