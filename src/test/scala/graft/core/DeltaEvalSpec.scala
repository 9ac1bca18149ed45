package graft.core

import graft.delta._
import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics cases ported from the reference's DeltaEvaluatorTest
  * (sor-api/src/test/.../delta/eval/DeltaEvaluatorTest.java). */
class DeltaEvalSpec extends AnyFunSuite {

  private def eval(delta: String, json: JValue): JValue =
    DeltaEvaluator.eval(Deltas.fromString(delta), json)

  private def j(text: String): JValue = JsonCodec.parse(text)

  // --- write-path sanitization (SanitizeDeltaVisitorTest parity) ---

  test("sanitize rejects non-object top-level values") {
    Seq("null", "false", "true", "1", "\"hello world\"", "[1,2]", """(..,"a")""")
      .foreach { text =>
        intercept[IllegalArgumentException](
          Deltas.sanitize(Deltas.fromString(text)))
      }
  }

  test("sanitize passes delete/noop/object literals; strips protected keys") {
    assert(Deltas.sanitize(Deltas.fromString("~")) === Deltas.fromString("~"))
    assert(Deltas.sanitize(Deltas.fromString("..")) === Deltas.fromString(".."))
    assert(Deltas.sanitize(Deltas.fromString("""{"x":1}""")) ===
      Deltas.fromString("""{"x":1}"""))
    // intrinsic data fields and ~tags stripped; other ~-keys kept
    assert(Deltas.sanitize(Deltas.fromString(
      """{..,"~x":1,"~id":1,"~table":1,"~version":1,"~signature":1,"~deleted":1,"~firstUpdateAt":1,"~lastUpdateAt":1,"~lastMutateAt":1,"~placement":1,"~y":~}""")) ===
      Deltas.fromString("""{..,"~x":1,"~y":~}"""))
    assert(Deltas.sanitize(Deltas.fromString(
      """{..,"name":"Bob","~tags":["tag0"]}""")) ===
      Deltas.fromString("""{..,"name":"Bob"}"""))
    assert(Deltas.sanitize(Deltas.fromString(
      """{"name":"Bob","~version":9}""")) ===
      Deltas.fromString("""{"name":"Bob"}"""))
  }

  test("sanitize recurses through conditional branches") {
    val d = Deltas.fromString(
      """if + then {..,"~x":1,"~version":1,"~y":~} else {..,"~x":~,"~version":2,"~y":2} end""")
    assert(Deltas.sanitize(d) === Deltas.fromString(
      """if + then {..,"~x":1,"~y":~} else {..,"~x":~,"~y":2} end"""))
  }

  test("set list") {
    assert(eval("""{..,"tags":["NEWBIE"]}""", JUndefined) === j("""{"tags":["NEWBIE"]}"""))
  }

  test("top level delete and resurrect") {
    var root: JValue = JUndefined
    root = eval("""{"name":"Bob"}""", root)
    assert(root === j("""{"name":"Bob"}"""))
    root = eval("~", root)
    assert(root === JUndefined)
    // update racing the delete wins going forward
    root = eval("""{..,"state":"APPROVED"}""", root)
    assert(root === j("""{"state":"APPROVED"}"""))
  }

  test("mid level delete") {
    var root: JValue = JUndefined
    root = eval("""{"name":"Bob","avatar":{"url":"http://images.example.com/1234"}}""", root)
    root = eval("""{..,"avatar":~}""", root)
    assert(root === j("""{"name":"Bob"}"""))
    // updateIfExists on deleted key is a no-op
    root = eval("""{..,"avatar":if + then {..,"state":"APPROVED"} end}""", root)
    assert(root === j("""{"name":"Bob"}"""))
    // a new update undoes the delete
    root = eval("""{..,"avatar":{"url":"http://images.example.com/2345"}}""", root)
    assert(root === j("""{"name":"Bob","avatar":{"url":"http://images.example.com/2345"}}"""))
  }

  test("retain + removeRest") {
    val root = j("""{"name":"Bob","version":5,"private":{"uid":"bob","uxid":"123xyz"}}""")
    val out = eval("""{"private":{..,"uxid":"789abc"},"version":..}""", root)
    assert(out === j("""{"version":5,"private":{"uid":"bob","uxid":"789abc"}}"""))
  }

  test("conditional update with removeRest") {
    val d = """{"key":if + then 5 end}"""
    assert(eval(d, j("""{"xyz":1,"key":2}""")) === j("""{"key":5}"""))
    assert(eval(d, j("""{"xyz":1}""")) === j("""{}"""))
    assert(!Deltas.fromString(d).isConstant)
    // unconditional form is constant
    val d2 = Deltas.fromString("""{"key":5}""")
    assert(d2 === Literal(j("""{"key":5}"""))) // collapsed at build time
  }

  test("set delta semantics: sorted-set union/remove") {
    // add to undefined
    assert(eval("""(..,"a","c")""", JUndefined) === j("""["a","c"]"""))
    // union with existing, sorted, dedup
    assert(eval("""(..,"b")""", j("""["c","a"]""")) === j("""["a","b","c"]"""))
    // remove
    assert(eval("""(..,~"c",~"x")""", j("""["c","a"]""")) === j("""["a"]"""))
    // replace (no ..)
    assert(eval("""("z")""", j("""["c","a"]""")) === j("""["z"]"""))
    // delete if empty
    assert(eval("""(..,~"a")?""", j("""["a"]""")) === JUndefined)
    assert(eval("""()?""", j("""["a"]""")) === JUndefined)
    // non-list existing treated as undefined
    assert(eval("""(..,"a")""", JString("not-a-list")) === j("""["a"]"""))
    // cross-type sort: null < bool < list < map < number < string
    assert(eval("""(..,null,true,3,"s")""", j("""[1.5]""")) ===
      JArr(Vector(JNull, JValue.JTrue, JDouble(1.5), JLong(3), JString("s"))))
  }

  test("map delta deleteIfEmpty") {
    assert(eval("""{..,"a":~}?""", j("""{"a":1}""")) === JUndefined)
    assert(eval("""{..,"a":~}?""", j("""{"a":1,"b":2}""")) === j("""{"b":2}"""))
    assert(eval("""{..,"a":~}""", j("""{"a":1}""")) === j("""{}"""))
  }

  test("conditional delta evaluates against current value") {
    val d = """if {..,"objVersion":le(5)} then {"content":"replaced","objVersion":6} end"""
    assert(eval(d, j("""{"content":"orig","objVersion":5}""")) ===
      j("""{"content":"replaced","objVersion":6}"""))
    assert(eval(d, j("""{"content":"orig","objVersion":7}""")) ===
      j("""{"content":"orig","objVersion":7}"""))
    // elif chain
    val d2 = """if 1 then "one" elif 2 then "two" else "other" end"""
    assert(eval(d2, JLong(1)) === JString("one"))
    assert(eval(d2, JLong(2)) === JString("two"))
    assert(eval(d2, JLong(3)) === JString("other"))
  }

  test("noop keeps value including undefined") {
    assert(eval("..", JUndefined) === JUndefined)
    assert(eval("..", JLong(5)) === JLong(5))
  }

  // --- predicate properties over RAW (non-normalized) delta trees ---
  // isConstant feeds Deltas.buildMap's constant folding and neverDeletes
  // its deleteIfEmpty dropping; a wrong answer there silently rewrites a
  // user's delta into one with different semantics, so both predicates are
  // checked against the evaluator itself on random raw ASTs.

  private def rawJValue(r: scala.util.Random, depth: Int): JValue =
    r.nextInt(if (depth <= 0) 5 else 7) match {
      case 0 => JNull
      case 1 => JBool(r.nextBoolean())
      case 2 => JLong(r.nextInt(20) - 10)
      case 3 => JDouble(r.nextInt(7) * 0.5)
      case 4 => JString(Seq("", "a", "b", "if", "~")(r.nextInt(5)))
      case 5 => JArr(Vector.fill(r.nextInt(3))(rawJValue(r, depth - 1)))
      case _ => JObj(Seq.fill(r.nextInt(3))(
        Seq("k1", "k2", "k3")(r.nextInt(3)) -> rawJValue(r, depth - 1)).toMap)
    }

  private def rawDelta(r: scala.util.Random, depth: Int): Delta =
    r.nextInt(if (depth <= 0) 3 else 6) match {
      case 0 => DeleteDelta
      case 1 => NoopDelta
      case 2 => Literal(rawJValue(r, 2))
      case 3 => MapDelta( // raw constructor: no buildMap normalization
        Seq.fill(r.nextInt(3))(
          Seq("k1", "k2", "k3")(r.nextInt(3)) -> rawDelta(r, depth - 1)).toMap,
        removeRest = r.nextBoolean(), deleteIfEmpty = r.nextBoolean())
      case 4 => SetDelta(
        Seq.fill(r.nextInt(3))(rawJValue(r, 1)).toSet,
        Seq.fill(r.nextInt(2))(rawJValue(r, 1)).toSet,
        removeRest = r.nextBoolean(), deleteIfEmpty = r.nextBoolean())
      case _ => ConditionalDelta(
        graft.condition.Conditions.fromString(
          Seq("+", "~", "is(num)", "is(object)", "gt(0)", """{..,"k1":+}""")(r.nextInt(6))),
        rawDelta(r, depth - 1), rawDelta(r, depth - 1))
    }

  private def probeInputs(r: scala.util.Random): Seq[JValue] =
    JUndefined +: Seq.fill(12)(rawJValue(r, 2))

  test("FUZZ: isConstant deltas evaluate identically on every input") {
    for (seed <- 1 to 400) {
      val r = new scala.util.Random(seed)
      val d = rawDelta(r, 3)
      if (d.isConstant) {
        val expected = DeltaEvaluator.eval(d, JUndefined)
        for (in <- probeInputs(r))
          assert(DeltaEvaluator.eval(d, in) === expected, s"delta: $d input: $in")
      }
    }
  }

  test("FUZZ: neverDeletes deltas never evaluate to UNDEFINED") {
    var checked = 0
    for (seed <- 1 to 400) {
      val r = new scala.util.Random(seed * 7 + 3)
      val d = rawDelta(r, 3)
      if (Deltas.neverDeletes(d)) {
        checked += 1
        for (in <- probeInputs(r))
          assert(DeltaEvaluator.eval(d, in) !== JUndefined, s"delta: $d input: $in")
      }
    }
    assert(checked >= 50, s"fuzz must bite: $checked")
  }

  test("FUZZ: set-delta results are always sorted and deduplicated") {
    for (seed <- 1 to 400) {
      val r = new scala.util.Random(seed * 13 + 1)
      val d = SetDelta(
        Seq.fill(r.nextInt(4))(rawJValue(r, 1)).toSet,
        Seq.fill(r.nextInt(3))(rawJValue(r, 1)).toSet,
        removeRest = r.nextBoolean(), deleteIfEmpty = r.nextBoolean())
      for (in <- probeInputs(r)) {
        DeltaEvaluator.eval(d, in) match {
          case JArr(items) =>
            val sorted = items.sorted(JValue.CrossTypeOrdering)
            assert(items === sorted, s"unsorted: $d on $in")
            assert(items.distinct === items, s"dupes: $d on $in")
          case JUndefined => assert(d.deleteIfEmpty, s"undefined without ?: $d")
          case other => fail(s"set delta produced $other")
        }
      }
    }
  }
}
