package graft.streaming

import graft.condition._
import graft.core.ConformanceCorpus
import graft.engine.ConditionCompiler
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** Native-compile coverage matrix (VERDICT r10 #3). The condition
  * compiler's fallback from Catalyst predicates to the parity UDF
  * ([[Databus.matchColumn]]) is silent by design — correctness gates can't
  * see it, but a regression demoting a common node type (e.g. a `like`
  * edge) costs ~10x on fanout. This spec runs every distinct condition in
  * the shared conformance corpus ([[ConformanceCorpus]], the reference's
  * SubsetEvaluator matrix — every condition family and edge, 231 distinct
  * conditions) through the compile entry points and PINS the per-node-type
  * compiled/fallback counts. Any newly-fallback case changes a count and
  * fails the build; any non-UnsupportedOperationException escape is a
  * crash that would break a real fanout (matchColumn catches only that
  * type) and fails loudly here.
  *
  * Contexts:
  *   - fanout_tags:      the condition as `{.., "~tags": c}` through
  *                       [[Databus.tryCompileNative]] (ArrayType target,
  *                       null-means-absent)
  *   - fanout_intrinsic: the condition as `intrinsic("~table": c)` through
  *                       the same (StringType target)
  *   - fanout_toplevel:  the condition verbatim as a subscription condition
  *     (field-level shapes route to the UDF here BY DESIGN — a bare
  *     `like("a*")` at subscription top level matches against the event's
  *     attribute JSON, which only the parity evaluator sees)
  *   - scan_field:       [[ConditionCompiler.compileField]] against a
  *                       StringType attribute column with the scan path's
  *                       intrinsics map (the DocStore pruning compiler)
  */
class NativeCompileCoverageSpec extends AnyFunSuite {

  private def nodeType(c: Condition): String = c.getClass.getSimpleName

  /** true=native, false=clean fallback; anything but
    * UnsupportedOperationException escaping is a crash (rethrown). */
  private def fanout(cond: Condition): Boolean =
    try Databus.tryCompileNative(cond, placementCol = Some("placement")).isDefined
    catch { case _: UnsupportedOperationException => false }

  private val scanIntrinsics = Map(
    Intrinsic.Table -> col("table"), Intrinsic.Id -> col("key"),
    Intrinsic.Placement -> col("placement"),
    Intrinsic.Deleted -> col("deleted"),
    Intrinsic.Signature -> col("signature"),
    Intrinsic.FirstUpdateAt -> col("first_update_at"),
    Intrinsic.LastUpdateAt -> col("last_update_at"),
    Intrinsic.LastMutateAt -> col("last_mutate_at"))

  private def scanField(cond: Condition): Boolean =
    try { ConditionCompiler.compileField(cond, col("attr"), StringType,
      scanIntrinsics); true }
    catch { case _: UnsupportedOperationException => false }

  private def matrix(conds: Seq[Condition], outcome: Condition => Boolean): String =
    conds.groupBy(nodeType).toSeq.sortBy(_._1).map { case (nt, cs) =>
      val (native, fallback) = cs.partition { c =>
        try outcome(c)
        catch { case e: UnsupportedOperationException => throw e
          case e: Throwable => fail(s"COMPILER CRASH (would escape " +
            s"matchColumn's catch) on $nt: $c -> ${e.getClass.getName}: " +
            s"${e.getMessage}") }
      }
      f"$nt%-22s native=${native.size}%3d fallback=${fallback.size}%3d"
    }.mkString("\n")

  private val all = ConformanceCorpus.conditions
  // the DSL cannot nest an intrinsic condition under ~tags or another
  // intrinsic, so wrapped contexts only see intrinsic-free conditions
  private val plain = all.filterNot(ConditionAlgebra.referencesIntrinsics)

  // every intrinsic-free corpus shape compiles natively in both wrapped
  // contexts — the matrix both gates demotions AND records corpus makeup
  private val allNativePlain =
    """AndCondition           native= 26 fallback=  0
      |ComparisonCondition    native= 26 fallback=  0
      |ConstantCondition      native=  2 fallback=  0
      |ContainsCondition      native= 26 fallback=  0
      |EqualCondition         native= 18 fallback=  0
      |InCondition            native= 18 fallback=  0
      |IsCondition            native=  8 fallback=  0
      |LikeCondition          native= 22 fallback=  0
      |MapCondition           native= 19 fallback=  0
      |NotCondition           native= 54 fallback=  0
      |OrCondition            native=  4 fallback=  0""".stripMargin

  test("fanout ~tags conditions: every corpus shape compiles natively") {
    val got = matrix(plain, c => fanout(Conditions.mapOf("~tags" -> c)))
    assert(got === allNativePlain, s"\nACTUAL MATRIX:\n$got")
  }

  test("fanout ~table intrinsic conditions: every corpus shape compiles natively") {
    val got = matrix(plain, c => fanout(Conditions.intrinsic(Intrinsic.Table, c)))
    assert(got === allNativePlain, s"\nACTUAL MATRIX:\n$got")
  }

  test("fanout top-level conditions: intrinsic/constant shapes compile, " +
      "attribute-JSON shapes route to the parity UDF by design") {
    val got = matrix(all, fanout)
    val pinned =
      """AndCondition           native=  0 fallback= 26
        |ComparisonCondition    native=  0 fallback= 26
        |ConstantCondition      native=  2 fallback=  0
        |ContainsCondition      native=  0 fallback= 26
        |EqualCondition         native=  0 fallback= 18
        |InCondition            native=  0 fallback= 18
        |IntrinsicCondition     native=  8 fallback=  0
        |IsCondition            native=  0 fallback=  8
        |LikeCondition          native=  0 fallback= 22
        |MapCondition           native=  0 fallback= 19
        |NotCondition           native=  0 fallback= 54
        |OrCondition            native=  0 fallback=  4""".stripMargin
    assert(got === pinned, s"\nACTUAL MATRIX:\n$got")
  }

  test("scan-path compileField: every corpus shape compiles against a string attribute") {
    val got = matrix(all, scanField)
    val pinned =
      """AndCondition           native= 26 fallback=  0
        |ComparisonCondition    native= 26 fallback=  0
        |ConstantCondition      native=  2 fallback=  0
        |ContainsCondition      native= 26 fallback=  0
        |EqualCondition         native= 18 fallback=  0
        |InCondition            native= 18 fallback=  0
        |IntrinsicCondition     native=  8 fallback=  0
        |IsCondition            native=  8 fallback=  0
        |LikeCondition          native= 22 fallback=  0
        |MapCondition           native= 19 fallback=  0
        |NotCondition           native= 54 fallback=  0
        |OrCondition            native=  4 fallback=  0""".stripMargin
    assert(got === pinned, s"\nACTUAL MATRIX:\n$got")
  }

  test("real subscription shapes (bool algebra over ~tags + intrinsics) compile natively") {
    import Conditions._
    val tags = mapOf("~tags" -> containsAny(
      Seq(graft.json.JString("etl"), graft.json.JString("replica"))))
    val tbl = intrinsic(Intrinsic.Table, like("review:*"))
    val plc = intrinsic(Intrinsic.Placement, equal(graft.json.JString("ugc_global:ugc")))
    for (shape <- Seq(and(Seq(tags, tbl)), or(Seq(tags, plc)),
        and(Seq(tags, not(tbl), plc)), not(or(Seq(tags, tbl)))))
      assert(fanout(shape), s"common fanout shape fell back to the UDF: $shape")
  }

  test("the UTF-16 divergence edge still falls back cleanly, not silently") {
    // a comparison literal at/above U+D800 is the documented non-compilable
    // edge: tryCompileNative must fall back, compileField must throw (the
    // char is built arithmetically — a raw escape would make this file
    // binary to git)
    val edge = Conditions.gt(graft.json.JString("x" + 0xE000.toChar))
    assert(!fanout(Conditions.intrinsic(Intrinsic.Table, edge)))
    assertThrows[UnsupportedOperationException](
      ConditionCompiler.compileField(edge, col("attr"), StringType))
    // while the same comparison below the divergence stays native
    assert(fanout(Conditions.intrinsic(Intrinsic.Table,
      Conditions.gt(graft.json.JString("xy")))))
  }
}
