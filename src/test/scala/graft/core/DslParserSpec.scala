package graft.core

import graft.condition._
import graft.delta._
import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Grammar parity cases ported from the reference's DeltaParserTest /
  * ConditionParserTest (sor-api/src/test/.../delta/DeltaParserTest.java):
  * (input text, canonical printed form). */
class DslParserSpec extends AnyFunSuite {

  private def roundTrip(in: String, canonical: String): Unit = {
    val d = Deltas.fromString(in)
    assert(d.toString === canonical, s"print of $in")
    // canonical form re-parses to the same AST
    assert(Deltas.fromString(canonical) === d, s"reparse of $canonical")
  }

  private def condRoundTrip(in: String, canonical: String): Unit = {
    val c = Conditions.fromString(in)
    assert(c.toString === canonical, s"print of $in")
    assert(Conditions.fromString(canonical) === c, s"reparse of $canonical")
  }

  test("or builder normalization (OrConditionTest parity)") {
    import graft.condition._
    def ieq(n: String, v: String) = Conditions.intrinsic(n, Conditions.equal(JString(v)))
    assert(Conditions.or(Seq.empty) === Conditions.alwaysFalse)
    assert(Conditions.or(Seq(Conditions.equal(JLong(1)))) === Conditions.equal(JLong(1)))
    // equal branches merge into ONE in()
    assert(Conditions.or(Seq(Conditions.equal(JLong(1)),
        Conditions.equal(JString("hello world")))) ===
      Conditions.in(Seq(JLong(1), JString("hello world"))))
    // same-intrinsic branches merge their sub-conditions
    assert(Conditions.or(Seq(ieq(Intrinsic.Table, "foo"), ieq(Intrinsic.Table, "bar"))) ===
      Conditions.intrinsic(Intrinsic.Table,
        Conditions.in(Seq(JString("bar"), JString("foo")))))
    // mixed: values, then intrinsics by name, then the rest
    val mixed = Conditions.or(Seq(
      Conditions.equal(JLong(1)), Conditions.equal(JLong(5)),
      ieq(Intrinsic.Table, "foo"), ieq(Intrinsic.Id, "id"),
      ieq(Intrinsic.Table, "bar"), Conditions.is(State.UNDEFINED)))
    assert(mixed === OrCondition(Vector(
      Conditions.in(Seq(JLong(1), JLong(5))),
      Conditions.intrinsic(Intrinsic.Id, Conditions.equal(JString("id"))),
      Conditions.intrinsic(Intrinsic.Table,
        Conditions.in(Seq(JString("bar"), JString("foo")))),
      Conditions.is(State.UNDEFINED))))
    // constants short-circuit / drop
    assert(Conditions.or(Seq(Conditions.alwaysFalse, Conditions.alwaysTrue)) ===
      Conditions.alwaysTrue)
    assert(Conditions.or(Seq(Conditions.alwaysFalse, Conditions.equal(JLong(1)))) ===
      Conditions.equal(JLong(1)))
  }

  test("basic deltas") {
    roundTrip("..", "..")
    roundTrip("~", "~")
    roundTrip("3", "3")
    roundTrip("\"s\"", "\"s\"")
    roundTrip("""{..,"tags":["EARLY_ADOPTER"]}""", """{..,"tags":["EARLY_ADOPTER"]}""")
  }

  test("literal map sorts keys") {
    roundTrip("""{"tags":["NEWBIE"],"photos":3}""", """{"photos":3,"tags":["NEWBIE"]}""")
  }

  test("scientific notation canonicalizes") {
    roundTrip("""{..,"missing":if -3.2e14 then ~ end}""", """{..,"missing":if -3.2E14 then ~ end}""")
  }

  test("deleteIfEmpty normalization (MapDeltaBuilder.build parity)") {
    roundTrip("""{..,"key":~}?""", """{..,"key":~}?""")
    roundTrip("""{..,"key":{}?}?""", """{..,"key":~}?""")
    roundTrip("""{..,"key":{}}?""", """{..,"key":{}}""")
    roundTrip("""{..,"key":[]}?""", """{..,"key":[]}""")
    roundTrip("""{..,"1st":{}?,"2nd":~}?""", """{..,"1st":~,"2nd":~}?""")
    roundTrip("""{..,"1st":{}?,"2nd":[],"3rd":{"1":2}?,"4th":[3],"5th":{}}?""",
      """{..,"1st":~,"2nd":[],"3rd":{"1":2},"4th":[3],"5th":{}}""")
  }

  test("constant map deltas collapse to literals") {
    roundTrip("""{..,"rating":{}?}""", """{..,"rating":~}""")
    roundTrip("""{"rating":~}""", "{}")
    roundTrip("""{"z":{..,"a":"b"}}""", """{"z":{..,"a":"b"}}""")
  }

  test("conditional deltas") {
    roundTrip("""{..,"rating":if 5 then ~ end}""", """{..,"rating":if 5 then ~ end}""")
    roundTrip("""if is(undefined) then {"rating":5} end""", """if ~ then {"rating":5} end""")
    roundTrip("""{..,"photo":if + then {..,"status":"APPROVED"} end}""",
      """{..,"photo":if + then {..,"status":"APPROVED"} end}""")
    roundTrip("""{..,"published":if {..,"status":"APPROVED"} then true else false end}""",
      """{..,"published":if {..,"status":"APPROVED"} then true else false end}""")
    roundTrip(
      """{..,"published":if {..,"status":"APPROVED"} then true elif {..,"status":"SUBMITTED"} then false else ~ end}""",
      """{..,"published":if {..,"status":"APPROVED"} then true elif {..,"status":"SUBMITTED"} then false else ~ end}""")
    roundTrip("""if {..,"objVersion":le(5)} then {"content":"replaced","objVersion":6} end""",
      """if {..,"objVersion":le(5)} then {"content":"replaced","objVersion":6} end""")
  }

  test("set deltas") {
    roundTrip("""if {..,"badges":contains("top5")} then {..,"badges":(..,"top10")} end""",
      """if {..,"badges":contains("top5")} then {..,"badges":(..,"top10")} end""")
    roundTrip("""{..,"tags":(..,"a",~"b")?}""", """{..,"tags":(..,"a",~"b")?}""")
  }

  test("parse errors") {
    def bad(in: String): Unit = intercept[ParseException](Deltas.fromString(in))
    bad("""[..,"NEWBIE"]""")
    bad("""{true:false,null:0,1:2}""")
    bad("""[,1,,3,]""")
    bad("""{..,"1":2,,,"3":4,}""")
    bad("""[{"z":[{..,"a":"b"}]}]""")
    bad("""{"z":{.,"a":"b"}}""")
    bad("""{"z":{...,"a":"b"}}""")
    bad("""{1:2}""")
    bad("""{..,"rating":if {}? then ~ end}""")
  }

  test("conditions round trip") {
    condRoundTrip("alwaysTrue()", "alwaysTrue()")
    condRoundTrip("alwaysFalse()", "alwaysFalse()")
    condRoundTrip("in(1,2,3)", "in(1,2,3)")
    condRoundTrip("in(1)", "1") // collapses to equal
    condRoundTrip("in()", "alwaysFalse()")
    condRoundTrip("not(not(gt(3)))", "gt(3)")
    condRoundTrip("is(null)", "is(null)")
    condRoundTrip("is(undefined)", "~")
    condRoundTrip("is(defined)", "+")
    condRoundTrip("""like("re*iew")""", """like("re*iew")""")
    condRoundTrip("""like("review")""", "\"review\"") // no wildcard => equal
    condRoundTrip("""intrinsic("~table":"review")""", """intrinsic("~table":"review")""")
    // the or-builder normalization puts merged values before other
    // branches (OrConditionBuilderImpl.build order)
    condRoundTrip("""intrinsic("~table":like("review:*"),"a")""",
      """intrinsic("~table":or("a",like("review:*")))""")
    condRoundTrip("partition(8:1,2)", "partition(8:in(1,2))")
    condRoundTrip("""{..,"rating":ge(4),"about":{..,"author":"Bob"}}""",
      """{..,"about":{..,"author":"Bob"},"rating":ge(4)}""")
    condRoundTrip("""containsAny("do","re")""", """containsAny("do","re")""")
    condRoundTrip("""contains("x")""", """contains("x")""")
    condRoundTrip("containsAny()", "alwaysTrue()")
    condRoundTrip("containsOnly()", "containsOnly()")
    condRoundTrip("{}", "{}") // equality against empty map
  }

  test("printer wire tokens are locale-independent (tr dotless-i)") {
    val prior = java.util.Locale.getDefault
    try {
      // under tr, "STRING".toLowerCase is "strıng" — the printed condition
      // would no longer re-parse; the printer must fold via Locale.ROOT
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(IsCondition(State.STRING).toString === "is(string)")
      assert(DslParser.parseCondition("is(string)") === IsCondition(State.STRING))
      condRoundTrip("is(string)", "is(string)")
    } finally java.util.Locale.setDefault(prior)
  }

  test("condition equality literals") {
    assert(Conditions.fromString("3") === EqualCondition(JLong(3)))
    assert(Conditions.fromString("3.0") === EqualCondition(JDouble(3.0)))
    assert(Conditions.fromString("\"s\"") === EqualCondition(JString("s")))
    assert(Conditions.fromString("null") === EqualCondition(JNull))
    assert(Conditions.fromString("""{"a":1}""") === EqualCondition(JObj(Map("a" -> JLong(1)))))
  }
}
