package graft.core

import graft.condition._
import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics cases ported from the reference's ConditionEvaluatorTest
  * (sor-api/src/test/.../condition/eval/ConditionEvaluatorTest.java). */
class ConditionEvalSpec extends AnyFunSuite {

  private def eval(c: String, json: JValue): Boolean =
    ConditionEvaluator.eval(Conditions.fromString(c), json)

  private def eval(c: String, json: JValue, in: IntrinsicsView): Boolean =
    ConditionEvaluator.eval(Conditions.fromString(c), json, in)

  private val intrinsics = IntrinsicsView(
    id = "abc", table = "review", signature = "sig", deleted = false,
    firstUpdateAt = "2012-07-08T22:21:36.866Z",
    lastUpdateAt = "2012-07-08T22:21:36.866Z",
    lastMutateAt = "2012-07-08T22:21:36.866Z",
    placement = "ugc_global:ugc")

  test("constants") {
    for (v <- Seq(JUndefined, JNull, JValue.JTrue, JValue.JFalse, JValue.obj("foo" -> JLong(1)))) {
      assert(eval("alwaysTrue()", v))
      assert(!eval("alwaysFalse()", v))
    }
  }

  test("not / or / and") {
    assert(!eval("not(alwaysTrue())", JNull))
    assert(eval("not(alwaysFalse())", JNull))
    assert(!eval("or()", JValue.JTrue))
    assert(!eval("or(1)", JLong(2)))
    assert(!eval("or(1,2)", JLong(3)))
    assert(eval("or(1,2)", JLong(2)))
    assert(eval("and()", JValue.JTrue))
    assert(!eval("and(1)", JLong(2)))
    assert(!eval("and(1,2)", JLong(2)))
    assert(eval("and(is(num),2)", JLong(2)))
  }

  test("in") {
    assert(!eval("in()", JValue.JTrue))
    assert(!eval("in(1)", JLong(2)))
    assert(!eval("in(1,2)", JLong(3)))
    assert(eval("in(1,2)", JLong(2)))
    assert(!eval("in(1,2)", JNull))
    assert(eval("in(null,true,\"string\")", JNull))
    assert(eval("in(null,true,\"string\")", JValue.JTrue))
    assert(eval("in(null,true,\"string\")", JString("string")))
    assert(!eval("in(null,true,\"string\")", JLong(5)))
  }

  test("equality is type-strict: 3 != 3.0") {
    assert(eval("3", JLong(3)))
    assert(!eval("3", JDouble(3.0)))
    assert(!eval("3.0", JLong(3)))
    assert(eval("3.0", JDouble(3.0)))
    assert(!eval("in(3)", JDouble(3.0)))
  }

  test("comparisons promote long/double but equality does not") {
    assert(eval(s"gt(${Long.MaxValue - 1})", JLong(Long.MaxValue)))
    assert(eval("gt(27)", JLong(28)))
    assert(eval("ge(27)", JLong(28)))
    assert(!eval("le(27)", JLong(28)))
    assert(!eval("lt(27)", JLong(28)))
    assert(!eval("gt(55.5)", JDouble(55.5)))
    assert(eval("ge(55.5)", JDouble(55.5)))
    assert(eval("le(55.5)", JDouble(55.5)))
    assert(!eval("lt(55.5)", JDouble(55.5)))
    assert(eval("gt(2.5)", JLong(3))) // cross-type numeric promotion
    assert(eval("gt(\"aaa\")", JString("bbb")))
    assert(eval("ge(\"ccc\")", JString("ccc")))
    assert(eval("le(\"ccc\")", JString("ccc")))
    assert(eval("lt(\"zzz\")", JString("yyy")))
    // null comparisons always false
    assert(!eval("gt(22)", JNull))
    assert(!eval("gt(49.7)", JNull))
    // mixed types always false
    assert(!eval("le(\"5\")", JLong(5)))
    assert(!eval("le(5)", JString("5")))
    assert(!eval("le(5)", JValue.obj("key" -> JString("value"))))
    assert(!eval("le(5)", JValue.arr(JLong(1), JLong(2), JLong(3))))
  }

  test("is() type tests; UNDEFINED vs null trichotomy") {
    assert(eval("is(undefined)", JUndefined))
    assert(!eval("is(undefined)", JNull))
    assert(eval("is(defined)", JNull))
    assert(!eval("is(defined)", JUndefined))
    assert(eval("is(null)", JNull))
    assert(!eval("is(null)", JUndefined))
    assert(eval("is(bool)", JValue.JTrue))
    assert(eval("is(num)", JLong(3)))
    assert(eval("is(num)", JDouble(3.5)))
    assert(eval("is(string)", JString("x")))
    assert(eval("is(array)", JValue.arr()))
    assert(eval("is(object)", JValue.obj()))
    assert(!eval("is(object)", JValue.arr()))
  }

  test("contains family") {
    assert(eval("contains(3)", JValue.arr(JLong(1), JLong(2), JLong(3))))
    assert(!eval("contains(3)", JValue.arr(JLong(1), JLong(2))))
    assert(!eval("contains(3)", JLong(3))) // not a list
    assert(eval("containsAny(\"do\",\"re\")", JValue.arr(JString("do"), JString("re"))))
    assert(eval("containsAny(\"do\",\"re\")", JValue.arr(JString("re"), JString("mi"))))
    assert(!eval("containsAny(\"do\",\"re\")", JValue.arr(JString("mi"))))
    assert(eval("containsAll(\"do\",\"re\")", JValue.arr(JString("do"), JString("re"), JString("mi"))))
    assert(!eval("containsAll(\"do\",\"re\")", JValue.arr(JString("do"), JString("mi"))))
    assert(eval("containsOnly(\"do\",\"re\")", JValue.arr(JString("do"), JString("re"))))
    assert(!eval("containsOnly(\"do\",\"re\")", JValue.arr(JString("do"), JString("re"), JString("mi"))))
    assert(!eval("containsOnly(\"do\",\"re\")", JValue.arr(JString("do"))))
    // empty ANY/ALL match everything (even non-lists? no - lists only is for values)
    assert(eval("containsAny()", JValue.arr()))
    assert(eval("containsAll()", JValue.arr()))
    assert(eval("containsOnly()", JValue.arr()))
    assert(!eval("containsOnly()", JValue.arr(JString("x"))))
  }

  test("like matches strings only, glob with *") {
    assert(eval("like(\"re*iew\")", JString("review")))
    assert(eval("like(\"re*\")", JString("review")))
    assert(eval("like(\"*view\")", JString("review")))
    assert(eval("like(\"*evi*\")", JString("review")))
    assert(eval("like(\"*\")", JString("anything")))
    assert(!eval("like(\"re*\")", JLong(5)))
    assert(!eval("like(\"re*\")", JNull))
    assert(!eval("like(\"re*iew\")", JString("rev")))
    assert(eval("like(\"a*b*c\")", JString("a-b-c")))
    assert(eval("like(\"a*b*c\")", JString("abc")))
    assert(!eval("like(\"a*b*c\")", JString("acb")))
    // no-overlap: pattern "aa*aa" must not match "aaa"
    assert(!eval("like(\"aa*aa\")", JString("aaa")))
    assert(eval("like(\"aa*aa\")", JString("aaaa")))
    // escaped star
    assert(eval("like(\"a\\\\*b\")", JString("a*b")))
    assert(!eval("like(\"a\\\\*b\")", JString("axb")))
  }

  test("like escape parity: backslash escapes ANY next char (LikeConditionImpl.create)") {
    // "a\b" denotes the literal string "ab"
    assert(LikeCondition("a\\b").matches("ab"))
    assert(!LikeCondition("a\\b").matches("a\\b"))
    // escaped backslash is a literal backslash
    assert(LikeCondition("a\\\\b").matches("a\\b"))
    // terminal backslash is rejected
    intercept[IllegalArgumentException](LikeCondition("abc\\").matches("abc"))
    intercept[IllegalArgumentException](Conditions.like("abc\\"))
    // consecutive wildcards collapse
    assert(LikeCondition("a**b").matches("axyb"))
    assert(LikeCondition("a**b").matches("ab"))
    // "a\\*": literal backslash then wildcard — compile is self-consistent
    val (lead, trail, segs) = LikeCondition.compile("a\\\\*")
    assert(!lead && trail && segs == Vector("a\\"))
    assert(LikeCondition("a\\\\*").matches("a\\xyz"))
    assert(!LikeCondition("a\\\\*").matches("axyz"))
    // escaped star alone is a literal (smart constructor folds to equal)
    assert(Conditions.like("a\\*") == EqualCondition(JString("a*")))
  }

  test("map conditions descend; missing field => UNDEFINED") {
    val doc = JValue.obj(
      "about" -> JValue.obj("author" -> JString("Bob")),
      "rating" -> JLong(4))
    assert(eval("""{..,"about":{..,"author":"Bob"},"rating":ge(4)}""", doc))
    assert(!eval("""{..,"rating":ge(5)}""", doc))
    assert(eval("""{..,"missing":~}""", doc)) // is(undefined) on missing key
    assert(!eval("""{..,"rating":~}""", doc))
    assert(eval("""{..,"rating":+}""", doc))
    assert(!eval("""{..,"rating":ge(4)}""", JString("not-a-map")))
    // null field is defined but null
    val doc2 = JValue.obj("x" -> JNull)
    assert(eval("""{..,"x":is(null)}""", doc2))
    assert(!eval("""{..,"x":~}""", doc2))
  }

  test("intrinsics") {
    assert(eval("""intrinsic("~id":"abc")""", JNull, intrinsics))
    assert(!eval("""intrinsic("~id":"def")""", JNull, intrinsics))
    assert(!eval("""intrinsic("~id":alwaysFalse())""", JNull, intrinsics))
    assert(eval("""intrinsic("~id":alwaysTrue())""", JNull, intrinsics))
    assert(!eval("""intrinsic("~id":in("xyz","123"))""", JNull, intrinsics))
    assert(eval("""intrinsic("~id":in("xyz","abc"))""", JNull, intrinsics))
    assert(eval("""intrinsic("~table":"review")""", JNull, intrinsics))
    assert(eval("""intrinsic("~table":like("re*iew"))""", JNull, intrinsics))
    assert(eval("""intrinsic("~deleted":false)""", JNull, intrinsics))
    assert(!eval("""intrinsic("~deleted":true)""", JNull, intrinsics))
    assert(eval("""intrinsic("~firstUpdateAt":"2012-07-08T22:21:36.866Z")""", JNull, intrinsics))
    assert(!eval("""intrinsic("~firstUpdateAt":"2012-07-08T22:29:31.588Z")""", JNull, intrinsics))
    val noDates = intrinsics.copy(firstUpdateAt = null, lastUpdateAt = null, lastMutateAt = null)
    assert(eval("""intrinsic("~firstUpdateAt":null)""", JNull, noDates))
    assert(!eval("""intrinsic("~firstUpdateAt":"2012-07-08T22:21:36.866Z")""", JNull, noDates))
    intercept[UnsupportedOperationException](eval("""intrinsic("~version":1)""", JNull, intrinsics))
    intercept[IllegalArgumentException](eval("""intrinsic("~id":"abc")""", JNull, null))
  }

  test("partition condition") {
    val p = Hashes.partitionOf("review", "abc", 8)
    assert(eval(s"partition(8:$p)", JNull, intrinsics))
    assert(!eval(s"partition(8:${p % 8 + 1})", JNull, intrinsics))
  }

  test("FUZZ: glob matcher agrees with a regex model") {
    // the segment-scan matcher (anchored head/tail + greedy leftmost middle
    // segments) is hand-optimized; a differential against the obviously
    // correct regex translation refutes it across the full small-alphabet
    // space, including the overlap traps (middle segment eating into the
    // anchored tail) and escape handling
    import graft.condition.LikeCondition
    val patternAtoms = Vector("a", "b", "*", "\\*", "\\\\", "\\a")
    def regexFor(pattern: String): java.util.regex.Pattern = {
      val u = LikeCondition.unescape(pattern) // same unescaping; model only the scan
      val sb = new StringBuilder("^")
      for (i <- u.chars.indices)
        sb.append(if (u.isWildcard(i)) ".*"
                  else java.util.regex.Pattern.quote(u.chars(i).toString))
      java.util.regex.Pattern.compile(sb.append("$").toString)
    }
    val rnd = new scala.util.Random(909)
    var mismatches = 0
    for (_ <- 1 to 4000) {
      val pattern = Vector.fill(rnd.nextInt(5))(
        patternAtoms(rnd.nextInt(patternAtoms.size))).mkString
      val s = Vector.fill(rnd.nextInt(7))(
        Seq("a", "b", "*", "\\")(rnd.nextInt(4))).mkString
      val got = LikeCondition(pattern).matches(s)
      val expected = regexFor(pattern).matcher(s).matches()
      if (got != expected) {
        mismatches += 1
        fail(s"glob <$pattern> on <$s>: matcher=$got regex=$expected")
      }
    }
    assert(mismatches === 0)
  }
}
