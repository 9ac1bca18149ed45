package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.condition._
import graft.json._

import scala.util.Random

/**
 * Randomized refutation fuzz for the condition algebra: fanout routing
 * (subscription pre-filtering) and simplify-time pruning rely on
 * [[ConditionAlgebra]]'s decisions, so a wrong "subset"/"disjoint" answer
 * silently misroutes or drops events. The hand-written ~380-case
 * conformance corpus pins reference parity; this spec probes THOUSANDS of
 * generated pairs the corpus never covers, refuting each positive decision
 * against the exact evaluator over a shared value domain (generation and
 * probing draw from the same pools, so matches actually occur and the
 * implications are exercised, not vacuous).
 *
 * Soundness only: the algebra is allowed to answer false conservatively
 * (isSubset=false for a true subset is safe — the router just evaluates
 * more), so only TRUE decisions are refutable.
 */
class ConditionAlgebraFuzzSpec extends AnyFunSuite {

  private val strs = Vector("a", "b", "ab", "v1", "frog")
  private val nums: Vector[JValue] =
    Vector(JLong(0), JLong(1), JLong(2), JLong(5), JDouble(1.5), JDouble(4.95))

  private def scalar(r: Random): JValue = r.nextInt(4) match {
    case 0 => JString(strs(r.nextInt(strs.size)))
    case 1 => nums(r.nextInt(nums.size))
    case 2 => JBool(r.nextBoolean())
    case _ => JNull
  }

  private def value(r: Random): JValue = r.nextInt(6) match {
    case 0 | 1 | 2 => scalar(r)
    case 3 => JArr(Vector.fill(r.nextInt(3))(scalar(r)))
    case _ => JObj(Seq.fill(r.nextInt(3))(
      Seq("k1", "k2")(r.nextInt(2)) -> scalar(r)).toMap)
  }

  private val states = Vector(State.UNDEFINED, State.DEFINED, State.NULL,
    State.BOOL, State.NUM, State.STRING, State.ARRAY, State.OBJECT)
  private val likes = Vector("a*", "*b", "v*1", "*ro*", "a*b", "fr*g")

  private def leaf(r: Random): Condition = r.nextInt(9) match {
    case 0 => Conditions.equal(value(r))
    case 1 => Conditions.in(Seq.fill(1 + r.nextInt(3))(scalar(r)))
    case 2 => Conditions.is(states(r.nextInt(states.size)))
    case 3 => Conditions.compare(
      Seq(Comparison.GT, Comparison.GE, Comparison.LT, Comparison.LE)(r.nextInt(4)),
      if (r.nextBoolean()) nums(r.nextInt(nums.size)) else JString(strs(r.nextInt(strs.size))))
    case 4 => Conditions.like(likes(r.nextInt(likes.size)))
    case 5 => Conditions.contains(scalar(r))
    case 6 => Conditions.containsAny(Seq.fill(1 + r.nextInt(2))(scalar(r)))
    case 7 => Conditions.containsAll(Seq.fill(1 + r.nextInt(2))(scalar(r)))
    case _ => if (r.nextBoolean()) Conditions.alwaysTrue else Conditions.alwaysFalse
  }

  private def cond(r: Random, depth: Int): Condition =
    if (depth <= 0) leaf(r)
    else r.nextInt(6) match {
      case 0 => Conditions.not(cond(r, depth - 1))
      case 1 => Conditions.and(Seq.fill(2)(cond(r, depth - 1)))
      case 2 => Conditions.or(Seq.fill(2)(cond(r, depth - 1)))
      case 3 => Conditions.mapOf(Seq.fill(1 + r.nextInt(2))(
        Seq("k1", "k2")(r.nextInt(2)) -> cond(r, depth - 1)): _*)
      case _ => leaf(r)
    }

  /** Probe battery: the full generation domain, plus the boundary values. */
  private def probes(r: Random): Seq[JValue] =
    Seq(JUndefined, JNull, JBool(true), JBool(false)) ++
      strs.map(JString(_)) ++ nums ++
      Seq(JArr(Vector.empty),
        JArr(Vector(JString("a"))), JArr(Vector(JString("a"), JLong(1))),
        JObj(Map.empty), JObj(Map("k1" -> JString("a"))),
        JObj(Map("k1" -> JLong(5), "k2" -> JString("b")))) ++
      Seq.fill(10)(value(r))

  test("FUZZ: isSubset positives are sound against the evaluator") {
    var positives = 0
    for (seed <- 1 to 3000) {
      val r = new Random(seed)
      val l = cond(r, 2); val rt = cond(r, 2)
      if (ConditionAlgebra.isSubset(l, rt)) {
        positives += 1
        for (v <- probes(r) if ConditionEvaluator.eval(l, v))
          assert(ConditionEvaluator.eval(rt, v),
            s"seed=$seed unsound subset: $l <= $rt refuted by $v")
      }
    }
    assert(positives >= 100, s"fuzz must bite: $positives subset positives")
  }

  test("FUZZ: isDisjoint positives are sound against the evaluator") {
    var positives = 0
    for (seed <- 1 to 3000) {
      val r = new Random(seed * 17 + 5)
      val l = cond(r, 2); val rt = cond(r, 2)
      if (ConditionAlgebra.isDisjoint(l, rt)) {
        positives += 1
        for (v <- probes(r))
          assert(!(ConditionEvaluator.eval(l, v) && ConditionEvaluator.eval(rt, v)),
            s"seed=$seed unsound disjoint: $l vs $rt both match $v")
      }
    }
    assert(positives >= 100, s"fuzz must bite: $positives disjoint positives")
  }

  test("FUZZ: inverseOf complements the evaluator on every probe") {
    var inverses = 0
    for (seed <- 1 to 2000) {
      val r = new Random(seed * 7 + 1)
      val c = cond(r, 2)
      ConditionAlgebra.inverseOf(c).foreach { inv =>
        inverses += 1
        for (v <- probes(r))
          assert(ConditionEvaluator.eval(c, v) !== ConditionEvaluator.eval(inv, v),
            s"seed=$seed inverse not complementary: $c vs $inv at $v")
      }
      // isInverse positives must also be exact complements
      val other = cond(r, 2)
      if (ConditionAlgebra.isInverse(c, other)) {
        for (v <- probes(r))
          assert(ConditionEvaluator.eval(c, v) !== ConditionEvaluator.eval(other, v),
            s"seed=$seed isInverse wrong: $c vs $other at $v")
      }
    }
    assert(inverses >= 300, s"fuzz must bite: $inverses inverses")
  }

  test("FUZZ: simplify preserves evaluator semantics") {
    for (seed <- 1 to 2000) {
      val r = new Random(seed * 13 + 3)
      val c = cond(r, 3)
      val s = ConditionAlgebra.simplify(c)
      for (v <- probes(r))
        assert(ConditionEvaluator.eval(s, v) === ConditionEvaluator.eval(c, v),
          s"seed=$seed simplify changed semantics: $c -> $s at $v")
    }
  }
}
