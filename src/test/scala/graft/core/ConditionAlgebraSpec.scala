package graft.core

import graft.condition._
import graft.json._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Golden cases ported from the reference's SubsetEvaluatorTest semantics +
  * the soundness property: isSubset(a,b) implies eval(a,v) -> eval(b,v). */
class ConditionAlgebraSpec extends AnyFunSuite {

  /** Deterministic sampling in place of a scalatest-scalacheck bridge. */
  private def forAll[T](gen: Gen[T], n: Int = 300)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var produced = 0
    while (produced < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => f(v); produced += 1 }
      seed = seed.next
    }
  }

  private def c(s: String): Condition = Conditions.fromString(s)
  private def sub(l: String, r: String): Boolean = ConditionAlgebra.isSubset(c(l), c(r))
  private def dis(l: String, r: String): Boolean = ConditionAlgebra.isDisjoint(c(l), c(r))

  test("equal condition subsets (SubsetEvaluatorTest parity)") {
    assert(sub("\"test\"", "is(string)"))
    assert(sub("\"test\"", "+"))
    assert(sub("\"test\"", "\"test\""))
    assert(sub("\"test\"", "in(\"test\",\"other\")"))
    assert(sub("\"test\"", "le(\"toast\")"))
    assert(sub("\"test\"", "like(\"t*t\")"))
    assert(sub("\"test\"", "not(like(\"z*\"))"))
    assert(sub("[\"fast\",\"slow\"]", "contains(\"fast\")"))
    assert(sub("[\"fast\",\"slow\"]", "containsOnly(\"fast\",\"slow\")"))
    assert(sub("""{"k":"v"}""", """{..,"k":"v"}"""))
    assert(!sub("\"test\"", "alwaysFalse()"))
    assert(!sub("\"test\"", "not(\"test\")"))
    assert(!sub("\"test\"", "is(num)"))
    assert(!sub("\"test\"", "~"))
    assert(!sub("\"test\"", "\"rake\""))
    assert(!sub("\"test\"", "in(\"nope\",\"nada\")"))
    assert(!sub("\"test\"", "gt(\"zebra\")"))
    assert(!sub("\"test\"", "like(\"z*\")"))
    assert(!sub("\"test\"", "not(like(\"t*\"))"))
    assert(!sub("\"test\"", "contains(\"test\")"))
    assert(!sub("[\"test\"]", "contains(\"nope\")"))
    assert(!sub("[\"fast\",\"slow\"]", "containsOnly(\"fast\")"))
    assert(!sub("\"test\"", """intrinsic("~table":"test")"""))
  }

  test("is condition subsets") {
    assert(sub("+", "alwaysTrue()"))
    assert(sub("is(string)", "is(string)"))
    assert(sub("is(string)", "+"))
    assert(sub("~", "~"))
    assert(sub("~", "not(+)"))
    assert(sub("is(string)", "not(is(null))"))
    assert(sub("is(bool)", "not(is(string))"))
    assert(!sub("is(string)", "alwaysFalse()"))
    assert(!sub("+", "is(string)"))
    assert(!sub("~", "is(string)"))
    assert(!sub("is(string)", "is(bool)"))
    assert(!sub("is(string)", "\"test\""))
    assert(!sub("is(string)", "not(is(string))"))
  }

  test("in condition subsets") {
    assert(sub("in(\"up\",\"down\")", "alwaysTrue()"))
    assert(sub("in(\"up\",\"down\")", "is(string)"))
    assert(sub("in(\"up\",\"down\")", "gt(\"c\")"))
    assert(sub("in(\"up\",\"down\")", "le(\"up\")"))
    assert(sub("in(\"frog\",\"flag\")", "like(\"f*g\")"))
    assert(sub("in(\"frog\",\"flag\")", "not(like(\"a*\"))"))
    assert(sub("in(\"up\",\"down\")", "not(\"left\")"))
    assert(!sub("in(\"up\",123)", "is(string)"))
    assert(!sub("in(\"up\",\"down\")", "gt(\"e\")"))
    assert(!sub("in(\"frog\",\"toad\")", "like(\"f*g\")"))
    assert(!sub("in(\"up\",\"down\")", "not(\"up\")"))
  }

  test("comparison range inclusion") {
    assert(sub("gt(5)", "gt(3)"))
    assert(sub("gt(5)", "ge(5)"))
    assert(sub("ge(6)", "gt(5)"))
    assert(sub("lt(3)", "lt(5)"))
    assert(sub("le(3)", "lt(4)"))
    assert(!sub("gt(3)", "gt(5)"))
    assert(!sub("ge(5)", "gt(5)"))
    assert(!sub("gt(5)", "lt(10)")) // non-numbers break interval intuition
    assert(sub("gt(2.5)", "gt(2)")) // cross numeric types
  }

  test("intrinsic and and/or decomposition") {
    assert(sub("""intrinsic("~table":"t")""", "alwaysTrue()"))
    assert(sub("""intrinsic("~table":"t")""", """intrinsic("~table":like("t*"))"""))
    assert(!sub("""intrinsic("~table":"t")""", """intrinsic("~table":like("x*"))"""))
    assert(sub("""or("a","b")""", """in("a","b","c")"""))
    assert(sub("""and(is(string),like("a*"))""", "is(string)"))
    assert(sub("\"abc\"", """and(is(string),like("a*"))"""))
    assert(!sub("""or("a","z")""", """in("a","b")"""))
  }

  test("disjointness") {
    assert(dis("\"a\"", "\"b\""))
    assert(dis("~", "+"))
    assert(dis("is(null)", "is(num)"))
    assert(!dis("+", "is(num)"))
    assert(dis("lt(3)", "gt(5)"))
    assert(dis("lt(3)", "ge(3)"))
    assert(!dis("le(3)", "ge(3)")) // both match exactly 3
    assert(dis("in(1,2)", "in(3,4)"))
    assert(!dis("in(1,2)", "in(2,3)"))
    assert(dis("""{..,"x":"a"}""", """{..,"x":"b"}"""))
    assert(!dis("""{..,"x":"a"}""", """{..,"y":"b"}"""))
    assert(dis("not(is(string))", "is(string)"))
  }

  test("multi-segment like subset (wildcard-substitution embedding)") {
    // every match of l starts with a and ends with c, so l implies a*c
    assert(sub("like(\"a*b*c\")", "like(\"a*c\")"))
    assert(!sub("like(\"a*c\")", "like(\"a*b*c\")"))
    // middle segments must embed in guaranteed literal runs
    assert(sub("like(\"review:*:cli*ent\")", "like(\"review:*ent\")"))
    assert(sub("like(\"review:*:client\")", "like(\"*:*\")"))
    assert(!sub("like(\"review*client\")", "like(\"*:*\")"))
    // anchors: prefix/suffix must extend, not just contain
    assert(sub("like(\"abc*\")", "like(\"ab*\")"))
    assert(!sub("like(\"ab*\")", "like(\"abc*\")"))
    assert(sub("like(\"*xyz\")", "like(\"*yz\")"))
    // a floating segment implies a shorter floating segment
    assert(sub("like(\"*abc*\")", "like(\"*b*\")"))
    assert(!sub("like(\"*b*\")", "like(\"*abc*\")"))
  }

  test("like disjointness via prefix/suffix incompatibility") {
    assert(dis("like(\"a*\")", "like(\"b*\")"))
    assert(dis("like(\"*a\")", "like(\"*b\")"))
    assert(!dis("like(\"a*\")", "like(\"ab*\")"))
    assert(!dis("like(\"a*z\")", "like(\"ab*z\")"))
    assert(dis("like(\"a*x\")", "like(\"a*y\")"))
    // like matches only strings
    assert(dis("like(\"a*\")", "is(num)"))
    assert(!dis("like(\"a*\")", "is(string)"))
  }

  test("inverse") {
    assert(ConditionAlgebra.isInverse(c("~"), c("+")))
    assert(ConditionAlgebra.isInverse(c("alwaysTrue()"), c("alwaysFalse()")))
    assert(ConditionAlgebra.isInverse(c("not(\"a\")"), c("\"a\"")))
    assert(!ConditionAlgebra.isInverse(c("gt(5)"), c("le(5)"))) // strings fail both
  }

  test("constructive inverse matches the reference's InverseEvaluator shapes") {
    import ConditionAlgebra.inverseOf
    // invertible forms (InverseEvaluator.java:51-128)
    assert(inverseOf(c("alwaysTrue()")) === Some(c("alwaysFalse()")))
    assert(inverseOf(c("not(\"a\")")) === Some(c("\"a\"")))
    assert(inverseOf(c("+")) === Some(c("~")))
    assert(inverseOf(c("~")) === Some(c("+")))
    // typed is(): OR of every OTHER concrete state, never DEFINED
    val notString = inverseOf(c("is(string)")).get
    for (v <- Seq[JValue](JNull, JBool(true), JLong(1), JDouble(1.5),
        JArr(Vector()), JObj(Map.empty), JUndefined))
      assert(ConditionEvaluator.eval(notString, v), s"$notString should accept $v")
    assert(!ConditionEvaluator.eval(notString, JString("s")))
    // comparisons invert to (wrong kind OR flipped comparison)
    val notGt5 = inverseOf(c("gt(5)")).get
    assert(ConditionEvaluator.eval(notGt5, JLong(5)))
    assert(ConditionEvaluator.eval(notGt5, JString("zebra")))
    assert(!ConditionEvaluator.eval(notGt5, JLong(6)))
    // no well-defined inverse (InverseEvaluator.java:195-215)
    assert(inverseOf(c("\"test\"")).isEmpty)
    assert(inverseOf(c("in(1,2)")).isEmpty)
    assert(inverseOf(c("contains(\"a\")")).isEmpty)
    assert(inverseOf(c("like(\"t*\")")).isEmpty)
    // and/or/map push through with not() standing in for non-invertible subs
    assert(inverseOf(c("""and(is(string),like("t*"))""")).isDefined)
    assert(inverseOf(c("""{..,"k":gt(1)}""")).isDefined)
  }

  test("SOUNDNESS: inverseOf(c) disagrees with c on EVERY value") {
    val conds = condTexts.map(c)
    forAll(valueGen) { v =>
      for (a <- conds; inv <- ConditionAlgebra.inverseOf(a)) {
        assert(ConditionEvaluator.eval(a, v) !== ConditionEvaluator.eval(inv, v),
          s"inverseOf($a) = $inv agrees with it on $v")
      }
    }
  }

  test("simplify drops subsumed branches and conjuncts") {
    assert(ConditionAlgebra.simplify(c("""and(is(string),like("ab*"))""")) === c("""like("ab*")"""))
    assert(ConditionAlgebra.simplify(c("""or("a",in("a","b"))""")) === c("""in("a","b")"""))
    assert(ConditionAlgebra.simplify(c("""and("a","b")""")) === Conditions.alwaysFalse)
    assert(ConditionAlgebra.simplify(c("""or(gt(5),gt(3))""")) === c("gt(3)"))
    assert(ConditionAlgebra.simplify(c("""and(gt(5),gt(3))""")) === c("gt(5)"))
  }

  private val valueGen: Gen[JValue] = {
    val scalar = Gen.oneOf[JValue](
      Gen.const(JNull), Gen.const(JUndefined),
      Gen.oneOf(true, false).map(JBool(_)),
      Gen.chooseNum(-10L, 10L).map(JLong(_)),
      Gen.chooseNum(-5.0, 5.0).map(JDouble(_)),
      Gen.oneOf("a", "b", "up", "down", "test", "frog", "flag", "").map(JString(_)))
    Gen.frequency(
      6 -> scalar,
      2 -> Gen.listOfN(3, Gen.oneOf[JValue](JString("fast"), JString("slow"), JLong(1))).map(l => JArr(l.toVector)),
      2 -> Gen.mapOfN(2, Gen.zip(Gen.oneOf("k", "x", "y"), scalar.filter(_ ne JUndefined))).map(JObj(_)))
  }

  private val condTexts = Seq(
    "alwaysTrue()", "alwaysFalse()", "\"test\"", "\"up\"", "3", "3.0",
    "in(\"up\",\"down\")", "in(1,2,3)", "is(string)", "is(num)", "is(null)", "~", "+",
    "gt(0)", "ge(2)", "lt(3)", "le(-1)", "gt(\"c\")", "like(\"f*g\")", "like(\"t*\")",
    "contains(\"fast\")", "containsAny(\"fast\",\"slow\")", "containsOnly(\"fast\")",
    """{..,"k":"a"}""", """{..,"x":gt(1)}""", """{..,"k":~}""",
    "not(\"test\")", "not(is(num))", """and(is(string),like("t*"))""",
    """or("up","down")""", """or(is(null),gt(2))""")

  test("SOUNDNESS: isSubset(a,b) implies eval(a,v) -> eval(b,v) for all v") {
    val conds = condTexts.map(c)
    forAll(valueGen) { v =>
      for (a <- conds; b <- conds) {
        if (ConditionAlgebra.isSubset(a, b) && ConditionEvaluator.eval(a, v)) {
          assert(ConditionEvaluator.eval(b, v),
            s"isSubset($a, $b) but eval($a)=true, eval($b)=false for $v")
        }
      }
    }
  }

  test("SOUNDNESS: isDisjoint(a,b) implies not both match") {
    val conds = condTexts.map(c)
    forAll(valueGen) { v =>
      for (a <- conds; b <- conds) {
        if (ConditionAlgebra.isDisjoint(a, b)) {
          assert(!(ConditionEvaluator.eval(a, v) && ConditionEvaluator.eval(b, v)),
            s"isDisjoint($a, $b) but both match $v")
        }
      }
    }
  }

  test("parse-print round trip is identity on random delta compositions") {
    import graft.delta._
    val leafDeltas = Seq("~", "..", "3", "\"s\"", """{"a":1}""", """{..,"x":~}""",
      """(..,"a",~"b")?""", """{..,"k":if gt(2) then 5 else ~ end}""",
      """{..,"t":(..,"x")}""", """[1,2,3]""", "null", "true")
    val deltaGen: Gen[Delta] = for {
      a <- Gen.oneOf(leafDeltas); b <- Gen.oneOf(leafDeltas)
      key <- Gen.oneOf("p", "q", "~r")
      op <- Gen.oneOf(0, 1, 2)
    } yield op match {
      case 0 => Deltas.buildMap(Map(key -> Deltas.fromString(a), "z" -> Deltas.fromString(b)),
        removeRest = false, deleteIfEmpty = false)
      case 1 => Deltas.conditional(Conditions.fromString("""{..,"s":1}"""),
        Deltas.fromString(a), Deltas.fromString(b))
      case 2 => Deltas.buildMap(Map(key -> Deltas.fromString(a)),
        removeRest = true, deleteIfEmpty = true)
    }
    forAll(deltaGen) { d =>
      assert(Deltas.fromString(d.toString) === d)
    }
  }

  test("parse-print round trip is identity on random condition compositions") {
    val leafGen = Gen.oneOf(condTexts)
    val condGen: Gen[Condition] = for {
      a <- leafGen; b <- leafGen; op <- Gen.oneOf(0, 1, 2)
    } yield op match {
      case 0 => Conditions.and(Seq(c(a), c(b)))
      case 1 => Conditions.or(Seq(c(a), c(b)))
      case 2 => Conditions.not(c(a))
    }
    forAll(condGen) { cond =>
      assert(Conditions.fromString(cond.toString) === cond)
    }
  }
}
