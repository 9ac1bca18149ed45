package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.condition._
import graft.delta._
import graft.json._

import scala.util.Random

/**
 * Print -> parse round-trip fuzz for the delta + condition wire protocol.
 *
 * The DSL text IS the wire format (the reference's toString/parse parity
 * tests: sor-api/src/test/java/com/bazaarvoice/emodb/sor/delta/DeltaJsonTest
 * and ConditionsTest), so `parse(print(x)) == x` must hold for every AST
 * the smart constructors can produce. Both sides normalize through the
 * SAME constructors (the parser calls Conditions.* / Deltas.buildMap), so
 * smart-constructed trees are fixed points of re-parsing — any mismatch
 * here is a real printer/parser/normalizer divergence, not test noise.
 *
 * Strings draw from a hostile pool (escapes, control chars, surrogate
 * pairs, DSL keywords, structural punctuation) to drive the
 * appendString/nextString escaping pair; numbers include the integral/
 * floating boundary spellings tokenToValue has to re-classify.
 */
class DslRoundTripSpec extends AnyFunSuite {

  private val strings = Vector(
    "", "a", "if", "then", "else", "elif", "end", "null", "true", "false",
    "~", "..", "*", "a*b", "\\", "\"", "\n", "\t\r\b\f",
    "\u0001\u001f", "héllo", "😀🎉", // incl. surrogate pairs
    "key:with,punct(){}[]<>;=#?", "line1\nline2", "back\\slash\"quote",
    "\u0000zero", "trailing ", " leading", "in", "contains", "partition")

  private val longs = Vector(0L, 1L, -1L, 42L, 999999999999L,
    Long.MaxValue, Long.MinValue)

  private val doubles = Vector(0.0, -0.0, 1.0, -1.5, 0.1, 1e-7, 1.5e300,
    4.9e-324, 1.0e21, -2.5e-10, 123456.789)

  // like() normalizes literal patterns to equality, "*" to is(string) —
  // both shapes stay in the pool so the normalized forms round-trip too
  private val likePatterns = Vector("a*b", "*suffix", "pre*", "*mid*",
    "a\\*b", "literal", "*", "**", "a*b*c", "star\\\\slash*")

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

  private def jvalue(r: Random, depth: Int): JValue = {
    val max = if (depth <= 0) 5 else 7
    r.nextInt(max) match {
      case 0 => JNull
      case 1 => JBool(r.nextBoolean())
      case 2 => JLong(pick(r, longs))
      case 3 => JDouble(pick(r, doubles))
      case 4 => JString(pick(r, strings))
      case 5 => JArr(Vector.fill(r.nextInt(3))(jvalue(r, depth - 1)))
      case _ => JObj(Seq.fill(r.nextInt(3))(
        pick(r, strings) -> jvalue(r, depth - 1)).toMap)
    }
  }

  private val states = Vector(State.UNDEFINED, State.DEFINED, State.NULL,
    State.BOOL, State.NUM, State.STRING, State.ARRAY, State.OBJECT)
  private val comparisons = Vector(Comparison.GT, Comparison.GE,
    Comparison.LT, Comparison.LE)

  private def leafCondition(r: Random): Condition = r.nextInt(10) match {
    case 0 => Conditions.equal(jvalue(r, 2))
    case 1 => Conditions.in(Seq.fill(1 + r.nextInt(3))(jvalue(r, 1)))
    case 2 => Conditions.is(pick(r, states))
    case 3 => Conditions.compare(pick(r, comparisons), jvalue(r, 1))
    case 4 => Conditions.like(pick(r, likePatterns))
    case 5 => Conditions.contains(jvalue(r, 1))
    case 6 => Conditions.containsAny(Seq.fill(r.nextInt(3))(jvalue(r, 1)))
    case 7 => Conditions.containsAll(Seq.fill(r.nextInt(3))(jvalue(r, 1)))
    case 8 => Conditions.containsOnly(Seq.fill(r.nextInt(3))(jvalue(r, 1)))
    case _ => if (r.nextBoolean()) Conditions.alwaysTrue else Conditions.alwaysFalse
  }

  private def condition(r: Random, depth: Int): Condition =
    if (depth <= 0) leafCondition(r)
    else r.nextInt(7) match {
      case 0 => Conditions.not(condition(r, depth - 1))
      case 1 => Conditions.and(Seq.fill(2 + r.nextInt(2))(condition(r, depth - 1)))
      case 2 => Conditions.or(Seq.fill(2 + r.nextInt(2))(condition(r, depth - 1)))
      case 3 => Conditions.mapOf(Seq.fill(1 + r.nextInt(3))(
        pick(r, strings) -> condition(r, depth - 1)): _*)
      case 4 => Conditions.intrinsic(
        pick(r, Vector(Intrinsic.Id, Intrinsic.Table, Intrinsic.Deleted)),
        condition(r, depth - 1))
      case 5 => Conditions.partition(1 + r.nextInt(32), condition(r, depth - 1))
      case _ => leafCondition(r)
    }

  private def delta(r: Random, depth: Int): Delta =
    if (depth <= 0) r.nextInt(3) match {
      case 0 => DeleteDelta
      case 1 => NoopDelta
      case _ => Deltas.literal(jvalue(r, 2))
    }
    else r.nextInt(6) match {
      case 0 => Deltas.buildMap(
        Seq.fill(r.nextInt(3))(pick(r, strings) -> delta(r, depth - 1)).toMap,
        removeRest = r.nextBoolean(), deleteIfEmpty = r.nextBoolean())
      case 1 =>
        val added = Seq.fill(r.nextInt(3))(jvalue(r, 1)).toSet
        val removed = Seq.fill(r.nextInt(2))(jvalue(r, 1)).toSet -- added
        SetDelta(added, removed,
          removeRest = r.nextBoolean(), deleteIfEmpty = r.nextBoolean())
      case 2 => Deltas.conditional(condition(r, 2), delta(r, depth - 1),
        delta(r, depth - 1)) // folds if the test normalized to a constant
      case 3 => Deltas.conditional(condition(r, 1), delta(r, depth - 1),
        Deltas.conditional(condition(r, 1), delta(r, depth - 1),
          delta(r, depth - 1))) // elif chain
      case _ => delta(r, 0)
    }

  test("condition print -> parse round-trips on 600 random trees") {
    for (seed <- 1 to 600) {
      val c = condition(new Random(seed), 3)
      val text = ConditionPrinter.print(c)
      val parsed =
        try Conditions.fromString(text)
        catch { case e: Exception =>
          fail(s"seed=$seed text failed to parse: <$text>: $e") }
      assert(parsed === c, s"seed=$seed text: <$text>")
    }
  }

  test("delta print -> parse round-trips on 600 random trees") {
    for (seed <- 1 to 600) {
      val d = delta(new Random(seed * 31 + 7), 3)
      val text = DeltaPrinter.print(d)
      val parsed =
        try Deltas.fromString(text)
        catch { case e: Exception =>
          fail(s"seed=$seed text failed to parse: <$text>: $e") }
      assert(parsed === d, s"seed=$seed text: <$text>")
    }
  }

  test("parseStream splits whitespace-separated printed deltas") {
    val r = new Random(12345)
    val ds = Vector.fill(20)(delta(r, 2))
    val joined = ds.map(DeltaPrinter.print).mkString(" \n\t ")
    assert(Deltas.parseStream(joined).toVector === ds)
  }

  test("hostile literal strings survive the full escape cycle") {
    for (s <- strings) {
      val d = Deltas.literal(JString(s))
      assert(Deltas.fromString(DeltaPrinter.print(d)) === d,
        s"string failed: ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }
}
