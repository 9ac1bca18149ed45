package graft.core

import graft.condition._
import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Conformance corpus for [[ConditionAlgebra.isSubset]], ported case-for-case
 * from the reference's SubsetEvaluator test matrix
 * (sor-api/src/test/java/.../condition/eval/SubsetEvaluatorTest.java) — the
 * pairwise implication truth table across every condition family, including
 * the reference's own documented false-negatives (conservative analysis:
 * false means "cannot prove").
 */
class SubsetConformanceSpec extends AnyFunSuite {

  import ConformanceCorpus.cases

  test("reference SubsetEvaluator matrix conformance") {
    val failures = cases.zipWithIndex.flatMap { case ((l, r, expected), i) =>
      val got = ConditionAlgebra.isSubset(l, r)
      if (got != expected) Some(s"case $i: isSubset($l, $r) = $got, expected $expected")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("corpus positives stay sound against the evaluator") {
    // for every TRUE case whose conditions are intrinsic-free, check on a
    // battery of values that l matching implies r matching
    val values: Seq[JValue] = Seq(
      JUndefined, JNull, JBool(true), JLong(0), JLong(5), JLong(6), JDouble(4.95),
      JDouble(9.5), JString(""), JString("a"), JString("ab"), JString("abc"),
      JString("aa"), JString("test"), JString("toast"), JString("up"),
      JString("frog"), JString("boat"), JString("g"), JString("zebra"),
      JArr(Vector(JString("up"))), JArr(Vector(JString("up"), JString("down"))),
      JArr(Vector(JString("fast"), JString("slow"))),
      JObj(Map("k1" -> JString("v1"))), JObj(Map("k" -> JString("v"))),
      JObj(Map("k1" -> JString("v1"), "k2" -> JString("v2"))))
    cases.filter(_._3).foreach { case (l, r, _) =>
      if (!ConditionAlgebra.referencesIntrinsics(l) &&
          !ConditionAlgebra.referencesIntrinsics(r)) {
        values.foreach { v =>
          if (ConditionEvaluator.eval(l, v))
            assert(ConditionEvaluator.eval(r, v),
              s"unsound: isSubset($l, $r) claimed but $v matches l, not r")
        }
      }
    }
  }
}
