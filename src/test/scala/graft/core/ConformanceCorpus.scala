package graft.core

import graft.condition._
import graft.json._

/**
 * The shared conformance corpus: the reference's SubsetEvaluator test
 * matrix, case-for-case (sor-api/src/test/java/.../condition/eval/
 * SubsetEvaluatorTest.java). Consumed by [[SubsetConformanceSpec]] (the
 * isSubset truth table) and by the streaming NativeCompileCoverageSpec
 * (the per-node-type native-compile/fallback matrix): one corpus, every
 * condition family, so a compiler regression cannot hide from either gate.
 */
object ConformanceCorpus {

  // ---- builder shorthands mirroring the reference's Conditions API
  val T = Conditions.alwaysTrue
  val F = Conditions.alwaysFalse
  def j(v: Any): JValue = v match {
    case s: String => JString(s)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case b: Boolean => JBool(b)
    case xs: Seq[_] => JArr(xs.map(j).toVector)
    case m: Map[_, _] => JObj(m.map { case (k, v2) => k.toString -> j(v2) })
    case v: JValue => v
  }
  def eq(v: Any) = Conditions.equal(j(v))
  def in(vs: Any*) = Conditions.in(vs.map(j))
  def isStr = Conditions.is(State.STRING)
  def isNum = Conditions.is(State.NUM)
  def isBool = Conditions.is(State.BOOL)
  def isNull = Conditions.is(State.NULL)
  def isList = Conditions.is(State.ARRAY)
  def isMap = Conditions.is(State.OBJECT)
  def isDef = Conditions.isDefined
  def isUndef = Conditions.isUndefined
  def gt(v: Any) = Conditions.gt(j(v))
  def ge(v: Any) = Conditions.ge(j(v))
  def lt(v: Any) = Conditions.lt(j(v))
  def le(v: Any) = Conditions.le(j(v))
  def like(p: String) = Conditions.like(p)
  def not(c: Condition) = Conditions.not(c)
  def and(cs: Condition*) = Conditions.and(cs)
  def or(cs: Condition*) = Conditions.or(cs)
  def contains(v: Any) = Conditions.contains(j(v))
  def containsAny(vs: Any*) = Conditions.containsAny(vs.map(j))
  def containsAll(vs: Any*) = Conditions.containsAll(vs.map(j))
  def containsOnly(vs: Any*) = Conditions.containsOnly(vs.map(j))
  def m(entries: (String, Condition)*) = Conditions.mapOf(entries: _*)
  def mContains(k: String, v: Any) = k -> eq(v)
  def mKey(k: String) = k -> isDef
  def intr(name: String, c: Condition) = Conditions.intrinsic(name, c)
  def intrEq(name: String, v: String) = Conditions.intrinsic(name, eq(v))
  val TBL = Intrinsic.Table
  val PLC = Intrinsic.Placement

  val cases: Seq[(Condition, Condition, Boolean)] = Seq(
    // Constant conditions
    (T, T, true), (F, F, true), (T, F, false), (F, T, true),
    // Equal conditions
    (eq("test"), T, true),
    (eq("test"), isStr, true),
    (eq("test"), isDef, true),
    (eq("test"), eq("test"), true),
    (eq("test"), in("test", "other"), true),
    (eq("test"), le("toast"), true),
    (eq("test"), like("t*t"), true),
    (eq("""t\t"""), like("""t\\t"""), true),
    (eq("test"), not(like("z*")), true),
    (eq(Seq("fast", "slow")), contains("fast"), true),
    (eq(Seq("fast", "slow")), containsOnly("fast", "slow"), true),
    (eq(Map("k" -> "v")), m(mContains("k", "v")), true),
    (eq("test"), F, false),
    (eq("test"), not(eq("test")), false),
    (eq("test"), isNum, false),
    (eq("test"), isUndef, false),
    (eq("test"), eq("rake"), false),
    (eq("test"), in("nope", "nada"), false),
    (eq("test"), gt("zebra"), false),
    (eq("test"), like("z*"), false),
    (eq("test"), not(like("t*")), false),
    (eq("""t\t"""), not(like("""t\\t""")), false),
    (eq("test"), m(mContains("test", "test")), false),
    (eq("test"), contains("test"), false),
    (eq(Seq("test")), contains("nope"), false),
    (eq(Seq("fast", "slow")), containsOnly("fast"), false),
    (eq(Map("k" -> "v")), m(mContains("k", "x")), false),
    (eq("test"), intrEq(TBL, "test"), false),
    // Is conditions
    (isDef, T, true),
    (isStr, isStr, true),
    (isStr, isDef, true),
    (isUndef, isUndef, true),
    (isUndef, not(isDef), true),
    (isStr, not(isNull), true),
    (isBool, not(isStr), true),
    (isStr, F, false),
    (isDef, isStr, false),
    (isUndef, isStr, false),
    (isStr, isBool, false),
    (isStr, eq("test"), false),
    (isStr, in("a", "b"), false),
    (isList, contains("a"), false),
    (isMap, m(mContains("key", "value")), false),
    (isStr, gt("a"), false),
    (isStr, intrEq(TBL, "test"), false),
    (isStr, not(isStr), false),
    (isStr, not(like("te*")), false),
    // In conditions
    (in("up", "down"), T, true),
    (in("up", "down"), isDef, true),
    (in("up", "down"), isStr, true),
    (in("up"), eq("up"), true),
    (in("up", "down"), gt("c"), true),
    (in("up", "down"), le("up"), true),
    (in(Seq("up"), Seq("down")), containsAny("up", "down"), true),
    (in(Seq("up", "down", "left"), Seq("up", "down", "right")), containsAll("up", "down"), true),
    (in("frog", "flag"), like("f*g"), true),
    (in("frog", "flag"), not(like("a*")), true),
    (in(Map("k1" -> "v1"), Map("k1" -> "v2")), m("k1" -> in("v1", "v2")), true),
    (in("up", "down"), not(eq("left")), true),
    (in("up", "down"), F, false),
    (in("up", "down"), isUndef, false),
    (in("up", 123), isStr, false),
    (in("up"), eq("down"), false),
    (in("up", "down"), gt("e"), false),
    (in("up", "down"), le("e"), false),
    (in(Seq("up"), Seq("down")), containsAny("up", "left"), false),
    (in(Seq("up", "down", "left"), Seq("up", "right")), containsAll("up", "down"), false),
    (in("frog", "toad"), like("f*g"), false),
    (in("frog", "flag"), not(like("f*g")), false),
    (in(Map("k1" -> "v1"), Map("k1" -> "v2")), m("k1" -> in("v1", "v3")), false),
    (in("up", "down"), not(eq("up")), false),
    (in("up", "down"), intrEq(TBL, "test"), false),
    (in("do", "re", "mi"), not(like("*do*")), false),
    // Intrinsic conditions
    (intr(TBL, eq("table")), T, true),
    (intr(TBL, eq("table")), intr(TBL, eq("table")), true),
    (intr(TBL, eq("table")), intr(TBL, like("t*")), true),
    (intr(TBL, eq("table")), F, false),
    (intr(TBL, eq("table")), intr(TBL, like("x*")), false),
    (intr(TBL, eq("table")), intr(PLC, eq("table")), false),
    (intr(TBL, eq("table")), eq("table"), false),
    (intr(TBL, eq("table")), in("table", "table2"), false),
    (intr(TBL, eq("table")), isDef, false),
    (intr(TBL, eq("table")), isStr, false),
    (intr(TBL, eq("table")), contains("table"), false),
    (intr(TBL, eq("table")), gt("t"), false),
    (intr(TBL, eq("table")), m(mContains(TBL, "table")), false),
    // Comparison conditions
    (gt(5), T, true),
    (gt(5), isDef, true),
    (gt(5), isNum, true),
    (gt("test"), isStr, true),
    (gt(5), gt(5), true),
    (gt(5), ge(5), true),
    (ge(5), gt(4.9), true),
    (ge(5), ge(5), true),
    (lt(5), lt(5), true),
    (lt(5), le(5), true),
    (le(5), lt(6.1), true),
    (le(5), le(5), true),
    (gt(5), not(le(5)), true),
    (ge(5), not(lt(5)), true),
    (lt(5), not(ge(5)), true),
    (le(5), not(gt(5)), true),
    (gt(5), F, false),
    (gt(5), isUndef, false),
    (gt(5), isStr, false),
    (gt("test"), isNull, false),
    (gt(5), gt(6), false),
    (gt(5), ge(6), false),
    (ge(5), gt(5), false),
    (ge(5), ge(6), false),
    (lt(5), lt(4), false),
    (lt(5), le(4), false),
    (le(5), lt(5), false),
    (le(5), le(4), false),
    (le(5), ge(20), false),
    (le(5), gt(5), false),
    (le(5), ge(5), false),
    (gt(5), not(le(6)), false),
    (ge(5), not(lt(6)), false),
    (lt(5), not(ge(4)), false),
    (le(5), not(gt(4)), false),
    // Contains conditions
    (contains("up"), T, true),
    (contains("up"), isDef, true),
    (contains("up"), isList, true),
    (contains("up"), contains("up"), true),
    (contains("up"), containsAny("up", "down"), true),
    (containsAll("up", "left"), containsAll("up", "left"), true),
    (containsAll("up", "down", "left"), containsAll("up", "left"), true),
    (containsAll("up", "left"), containsAny("up", "left", "right"), true),
    (containsAny("up", "left"), containsAny("up", "down", "left"), true),
    (containsOnly("up", "left"), containsOnly("up", "left"), true),
    (contains("up"), F, false),
    (contains("up"), isUndef, false),
    (contains("up"), isStr, false),
    (contains("up"), contains("down"), false),
    (contains("up"), containsAny("left", "right"), false),
    (contains("up"), containsAll("up", "down"), false),
    (containsAll("up", "left"), containsAll("up", "right"), false),
    (containsAll("up", "down"), containsAll("up", "down", "left"), false),
    (containsAll("up", "left"), containsAny("down", "right"), false),
    (containsAny("up", "down"), containsAny("left", "right"), false),
    (containsAny("up", "down"), containsAll("left", "right"), false),
    (containsOnly("up", "down"), containsOnly("up"), false),
    (containsOnly("up"), containsOnly("down"), false),
    (contains("up"), eq(Seq("up")), false),
    (contains("up"), in(Seq("up", "down"), Seq("up", "left")), false),
    (contains("up"), eq(Seq("down")), false),
    (contains("up"), intrEq(TBL, "up"), false),
    (contains("up"), like("up"), false),
    (contains("up"), m(mContains("up", "up")), false),
    // Like conditions
    (like("*oa*"), T, true),
    (like("*oa*"), isDef, true),
    (like("*oa*"), isStr, true),
    (like("*oa*"), not(isNull), true),
    (like("test"), eq("test"), true),
    (like("""\\dev\\null"""), eq("""\dev\null"""), true),
    (like("*oa*"), like("*oa*"), true),
    (like("bo*t"), like("bo*t"), true),
    (like("boa*"), like("*oa*"), true),
    (like("a*b*c*d*e"), like("*b*d*"), true),
    (like("a*"), not(like("b*")), true),
    (like("a*"), not(like("b*c")), true),
    (like("*z"), not(like("*y")), true),
    (like("*z"), not(like("x*y")), true),
    (like("a*az"), not(like("ab*yz")), true),
    (like("aa*z"), not(like("ab*yz")), true),
    (like("a*b*c"), not(like("x*y*z")), true),
    (like("ab*"), ge("a"), true),
    (like("ab*"), ge("ab"), true),
    (like("ab*"), gt("aa"), true),
    (like("ab*"), not(le("aa")), true),
    (like("*oa*"), F, false),
    (like("*oa*"), isUndef, false),
    (like("*oa*"), isNum, false),
    (like("test"), eq("contest"), false),
    (like("a*"), not(like("a*")), false),
    (like("a*z"), not(like("a*z")), false),
    (like("*z"), not(like("*z")), false),
    (like("*a*"), not(like("*e*")), false),
    (like("a*"), not(like("*z")), false),
    (like("*z"), not(like("a*")), false),
    (like("*"), not(like("a*b")), false),
    (like("a*b*c"), not(like("*b*c")), false),
    (like("a*b"), not(like("*")), false),
    (like("a*z"), not(like("ab*yz")), false),
    (like("ab*yz"), not(like("a*z")), false),
    (like("a*b"), not(isStr), false),
    (like("ab*c"), like("a*bc"), false),
    (like("a*"), in("apple", "ant"), false),
    (like("a*"), contains("apple"), false),
    (like("a*"), intrEq(TBL, "apple"), false),
    (like("a*"), m(mContains("apple", "apple")), false),
    (like("ab*"), ge("c"), false),
    (like("a*"), ge("ab"), false),
    (like("*a"), gt("a"), false),
    (like("ab*"), not(ge("aa")), false),
    // Map conditions
    (m(mKey("k1")), T, true),
    (m(mKey("k1")), isDef, true),
    (m(mKey("k1")), isMap, true),
    (m(mKey("k1"), "k2" -> eq("value")), m(mKey("k1"), "k2" -> eq("value")), true),
    (m(mContains("k1", 123), "k2" -> eq("value")),
      m("k1" -> isNum, "k2" -> like("*al*")), true),
    (m(mKey("k1"), mKey("k2")), m(mKey("k1")), true),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k1", "x"), mContains("k2", "y"))), true),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k1", "v1"), mContains("k2", "y"))), true),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k1", "x"), mContains("k2", "v2"))), true),
    (m(mKey("k1")), F, false),
    (m(mKey("k1")), isUndef, false),
    (m(mKey("k1")), isStr, false),
    (m(mKey("k1"), "k2" -> eq("value1")), m(mKey("k1"), "k2" -> eq("value2")), false),
    (m(mContains("k1", 123), "k2" -> eq("value")),
      m("k1" -> isNum, "k2" -> eq("nope")), false),
    (m(mKey("k1")), m(mKey("k1"), mKey("k2")), false),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k1", "v1"), mContains("k2", "v2"))), false),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k1", "v1"))), false),
    (m(mContains("k1", "v1"), mContains("k2", "v2")),
      not(m(mContains("k2", "v2"))), false),
    (m(mKey("k1")), eq(Map("k1" -> "v1")), false),
    (m(mKey("k1")), intr(TBL, eq("k1")), false),
    (m(mKey("k1")), in("k1"), false),
    (m(mKey("k1")), contains("k1"), false),
    (m(mKey("k1")), gt("k"), false),
    (m(mKey("k1")), like("k*"), false),
    // And conditions
    (and(ge("a"), le("z")), T, true),
    (and(ge("a"), le("z")), isDef, true),
    (and(ge("a"), le("z")), isStr, true),
    (and(ge("a"), le("z")), and(ge("a"), le("z")), true),
    (and(ge("b"), le("y")), and(ge("a"), le("z")), true),
    (and(ge("b"), le("y")), and(ge("a"), le("z"), isStr), true),
    (and(ge("a"), le("z"), like("*g*")), and(ge("a"), le("z")), true),
    (F, and(ge("a"), le("z")), true),
    (eq("g"), and(ge("a"), le("z")), true),
    (eq("a"), and(in("a", "b", "c"), isDef), true),
    (and(ge("a"), le("z")), or(isNull, isStr), true),
    (and(ge("a"), le("z")), not(and(isNull, isMap)), true),
    (and(ge("a"), le("z")), not(and(isNull, isStr)), true),
    (and(gt(5), lt(10)), not(and(gt(20), lt(30))), true),
    (and(ge("a"), le("z")), F, false),
    (and(ge("a"), le("z")), isUndef, false),
    (and(ge("a"), le("z")), isNum, false),
    (and(ge(5), le(10)), isStr, false),
    (and(ge("a"), le("k")), and(ge("c"), le("z")), false),
    (and(ge("c"), le("z")), and(ge("a"), le("k")), false),
    (and(ge("a"), le("b")), and(ge("x"), le("y")), false),
    (and(ge("a")), and(ge("a"), le("z")), false),
    (and(ge("a"), le("z")), and(ge("a"), le("z"), like("*g*")), false),
    (and(ge("a"), ge("b")), and(le("y"), le("z")), false),
    (and(le("a"), le("b")), and(ge("y"), ge("z")), false),
    (and(le("a"), le("b")), not(or(lt("y"), lt("z"))), false),
    (T, and(ge("a"), le("z")), false),
    (eq("g"), and(ge("y"), le("z")), false),
    (eq("a"), and(in("x", "y", "z"), isDef), false),
    (and(ge("a"), le("z")), or(isList, isMap), false),
    (and(like("a*"), like("*z")), and(like("b*"), like("*y")), false),
    (and(like("*a*"), like("*b*")), not(and(like("*c*"), like("*d*"))), false),
    (and(gt(5), lt(10)), not(and(gt(6), lt(9))), false),
    (and(gt(5), lt(10)), not(and(gt(8), lt(14))), false),
    // Or conditions
    (or(eq("a"), eq("b")), T, true),
    (or(eq("a"), eq("b")), isDef, true),
    (or(eq("a"), eq("b")), isStr, true),
    (or(eq("a"), eq("b")), or(eq("a"), eq("b")), true),
    (or(eq("a"), eq("b")), or(eq("a"), eq("b"), eq("c")), true),
    (or(eq("a"), eq("b")), and(ge("a"), le("b")), true),
    (F, or(eq("a"), eq("b")), true),
    (eq("a"), or(eq("a"), eq("b")), true),
    (in("a", "b"), or(eq("a"), eq("b")), true),
    (or(eq("a"), eq("b")), F, false),
    (or(eq("a"), eq("b")), isUndef, false),
    (or(eq("a"), eq("b")), isNum, false),
    (or(eq(12), eq("b")), isNum, false),
    (or(eq("a"), eq("b")), or(eq("a"), eq("c")), false),
    (or(eq("a"), eq("b"), eq("c")), or(eq("a"), eq("b")), false),
    (or(eq("a"), eq("c")), and(ge("b"), le("d")), false),
    (T, or(eq("a"), eq("b")), false),
    (eq("c"), or(eq("a"), eq("b")), false),
    (in("a", "c"), or(eq("a"), eq("b")), false),
    (isStr, or(eq("a"), eq("b")), false),
    // Not conditions
    (not(T), F, true),
    (not(F), T, true),
    (not(T), T, true),
    (not(isUndef), isDef, true),
    (not(isDef), isUndef, true),
    (and(like("ab*"), not(eq("abc"))), like("a*"), true),
    (not(or(isUndef, eq("v1"))), isDef, true),
    (not(and(eq("a"), eq("b"))), or(not(eq("a")), not(eq("b"))), true),
    (not(or(eq("a"), eq("b"))), and(not(eq("a")), not(eq("b"))), true),
    (not(like("a*")), not(like("a*")), true),
    (not(like("a*")), not(like("ab*")), true),
    (not(F), F, false),
    (not(isUndef), isUndef, false),
    (not(isDef), isDef, false),
    (not(isDef), isStr, false),
    (not(eq("bc")), like("a*"), false),
    (not(eq("v1")), isDef, false),
    (not(and(eq("a"), eq("b"))), or(not(eq("a")), not(eq("c"))), false),
    (not(or(eq("a"), eq("b"))), and(not(eq("a")), not(eq("c"))), false),
    (not(like("ab*")), not(like("a*")), false),
    // Reference-documented false-negatives (conservative analysis)
    (and(isNum, not(gt(1))), le(5), false),
    (and(isMap, not(m("k1" -> or(isUndef, eq("v1"))))), m("k1" -> isDef), false),
    // Equivalent expressions
    (le(1), le(5), true),
    (m("k1" -> not(or(isUndef, eq("v1")))), m("k1" -> isDef), true))


  /** Every distinct condition in the corpus (both sides of every pair). */
  lazy val conditions: Seq[Condition] =
    cases.flatMap(c => Seq(c._1, c._2)).distinct
}
