package graft.core

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Rison / O-Rison codec: spec examples from the public grammar
  * (mjtemplate.org/examples/rison.html), escape handling, roundtrips,
  * O-Rison object-body mode (RisonHelper.java:21-43 semantics). */
class RisonSpec extends AnyFunSuite {

  private def obj(kvs: (String, JValue)*): JObj = JObj(kvs.toMap)

  test("spec examples encode as published") {
    assert(Rison.encode(obj("a" -> JLong(0), "b" -> JLong(1))) === "(a:0,b:1)")
    assert(Rison.encode(JString("abc def")) === "'abc def'")
    assert(Rison.encode(JDouble(1.5)) === "1.5")
    assert(Rison.encode(JArr(Vector(JLong(1), JLong(2), JLong(3)))) === "!(1,2,3)")
    assert(Rison.encode(obj("id" -> JNull, "type" -> JString("/common/document")))
      === "(id:!n,type:/common/document)")
    assert(Rison.encode(JBool(true)) === "!t")
    assert(Rison.encode(JBool(false)) === "!f")
    assert(Rison.encode(JObj(Map.empty)) === "()")
    assert(Rison.encode(JArr(Vector.empty)) === "!()")
  }

  test("string quoting: ids stay bare, others quote with ! escapes") {
    assert(Rison.encode(JString("Clerk#000000123")) === "Clerk#000000123")
    assert(Rison.encode(JString("-starts-with-dash")) === "'-starts-with-dash'")
    assert(Rison.encode(JString("7digits-first")) === "'7digits-first'")
    assert(Rison.encode(JString("it's")) === "'it!'s'")
    assert(Rison.encode(JString("wow!")) === "'wow!!'")
    assert(Rison.encode(JString("")) === "''")
    assert(Rison.encode(JString("has space")) === "'has space'")
    assert(Rison.encode(JString("a,b")) === "'a,b'")
  }

  test("decode: spec examples and escapes") {
    assert(Rison.decode("(a:0,b:1)") === obj("a" -> JLong(0), "b" -> JLong(1)))
    assert(Rison.decode("'abc def'") === JString("abc def"))
    assert(Rison.decode("1.5") === JDouble(1.5))
    assert(Rison.decode("-3") === JLong(-3))
    assert(Rison.decode("1e-2") === JDouble(0.01))
    assert(Rison.decode("!(1,2,3)") === JArr(Vector(JLong(1), JLong(2), JLong(3))))
    assert(Rison.decode("'it!'s'") === JString("it's"))
    assert(Rison.decode("'wow!!'") === JString("wow!"))
    assert(Rison.decode("(id:!n,type:/common/document)")
      === obj("id" -> JNull, "type" -> JString("/common/document")))
  }

  test("roundtrip: encode(decode) and decode(encode) are identities") {
    val values = Seq[JValue](
      JNull, JBool(true), JBool(false), JLong(0), JLong(-42), JDouble(3.25),
      JString("bare"), JString("needs quoting!"), JString("it's"),
      JArr(Vector(JString("a b"), JLong(1), JNull,
        obj("k" -> JArr(Vector(JBool(false)))))),
      obj("comment" -> JString("initial write"), "host" -> JString("emodb-01"),
        "n" -> JLong(7), "nested" -> obj("deep" -> JArr(Vector(JLong(1))))))
    values.foreach { v =>
      val enc = Rison.encode(v)
      assert(Rison.decode(enc) === v, s"roundtrip of $enc")
    }
    val strings = Seq("(a:0,b:1)", "!(1,!t,'x y')", "''", "()", "!()")
    strings.foreach { s => assert(Rison.encode(Rison.decode(s)) === s) }
  }

  test("FUZZ: random JValues roundtrip through encode/decode") {
    // hostile strings drive the ! escape pair and the bare-id/quoted split;
    // numbers cover the long/double re-classification boundary
    val pool = Vector("", "bare", "needs space", "!", "'", "!!", "!'", "a!b",
      "it's!", "true", "null", "(", ")", ":", ",", "a:b,c", "héllo", "😀",
      "\n\t", "\u0000", "0", "-1", "1.5", "mixed'!(quote")
    val longs = Vector(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val doubles = Vector(0.5, -1.5, 0.1, 1e-7, 1.5e300, 123456.789)
    def gen(r: scala.util.Random, depth: Int): JValue =
      r.nextInt(if (depth <= 0) 5 else 7) match {
        case 0 => JNull
        case 1 => JBool(r.nextBoolean())
        case 2 => JLong(longs(r.nextInt(longs.size)))
        case 3 => JDouble(doubles(r.nextInt(doubles.size)))
        case 4 => JString(pool(r.nextInt(pool.size)))
        case 5 => JArr(Vector.fill(r.nextInt(3))(gen(r, depth - 1)))
        case _ => obj(Seq.fill(r.nextInt(3))(
          pool(r.nextInt(pool.size)) -> gen(r, depth - 1)): _*)
      }
    for (seed <- 1 to 800) {
      val v = gen(new scala.util.Random(seed), 3)
      val enc = Rison.encode(v)
      assert(Rison.decode(enc) === v, s"seed=$seed roundtrip of <$enc>")
    }
  }

  test("O-Rison: object body without parens, empty string = empty object") {
    val audit = obj("comment" -> JString("initial write"),
      "host" -> JString("emodb-01"), "~sor" -> JBool(true))
    val enc = Rison.encodeORison(audit)
    // canonical key order puts '~'-intrinsics first; '~' is a legal id char
    assert(enc === "~sor:!t,comment:'initial write',host:emodb-01")
    assert(Rison.decodeORison(enc) === audit)
    assert(Rison.decodeORison("") === JObj(Map.empty))
    assert(Rison.encodeORison(JObj(Map.empty)) === "")
    intercept[IllegalArgumentException](Rison.encodeORison(JLong(1)))
  }

  test("canonical: keys sort like canonical JSON regardless of insertion order") {
    val a = JObj(scala.collection.immutable.ListMap(
      "z" -> JLong(1), "a" -> JLong(2)))
    assert(Rison.encode(a) === "(a:2,z:1)")
  }

  test("malformed input rejected: trailing garbage, bad escapes, unterminated") {
    Seq("(a:1", "'abc", "!x", "(a:1)x", "!(1,", "(a)", "(:1)", "-", "(a:-)").foreach { bad =>
      intercept[IllegalArgumentException](Rison.decode(bad))
    }
    intercept[IllegalArgumentException](Rison.decodeORison(":1"))
  }
}
