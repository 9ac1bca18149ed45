package graft.condition

import graft.json._

/**
 * Renders conditions back to DSL text (round-trips through the parser).
 * Format parity with the reference's toString implementations
 * (sor-api/.../condition impl classes).
 */
object ConditionPrinter {

  def print(c: Condition): String = {
    val sb = new java.lang.StringBuilder
    append(sb, c)
    sb.toString
  }

  def append(sb: java.lang.StringBuilder, c: Condition): Unit = c match {
    case ConstantCondition(b) => sb.append(if (b) "alwaysTrue()" else "alwaysFalse()")
    case EqualCondition(v)    => JsonCodec.append(sb, v)
    case InCondition(vs) =>
      sb.append("in(")
      appendValues(sb, vs)
      sb.append(')')
    case IsCondition(State.UNDEFINED) => sb.append('~') // canonical short forms
    case IsCondition(State.DEFINED)   => sb.append('+')
    case IsCondition(state) =>
      // Locale.ROOT: default-locale toLowerCase turns STRING into "strıng"
      // under tr_TR (dotless i) — a wire-format token, never locale text
      sb.append("is(").append(state.toString.toLowerCase(java.util.Locale.ROOT)).append(')')
    case ComparisonCondition(op, v) =>
      sb.append(op.toString.toLowerCase(java.util.Locale.ROOT)).append('(')
      JsonCodec.append(sb, v)
      sb.append(')')
    case ContainsCondition(vs, containment) =>
      import Containment._
      containment match {
        case ALL if vs.size == 1 =>
          sb.append("contains(")
          JsonCodec.append(sb, vs.head)
          sb.append(')')
        case _ =>
          sb.append("contains").append(containment match {
            case ANY => "Any"; case ALL => "All"; case ONLY => "Only"
          }).append('(')
          appendValues(sb, vs)
          sb.append(')')
      }
    case LikeCondition(pattern) =>
      sb.append("like(")
      JsonCodec.appendString(sb, pattern)
      sb.append(')')
    case NotCondition(inner) =>
      sb.append("not(")
      append(sb, inner)
      sb.append(')')
    case AndCondition(cs) =>
      sb.append("and(")
      appendConditions(sb, cs)
      sb.append(')')
    case OrCondition(cs) =>
      sb.append("or(")
      appendConditions(sb, cs)
      sb.append(')')
    case MapCondition(entries) =>
      sb.append("{..")
      entries.keys.toArray.sorted(JsonCodec.keyOrdering).foreach { k =>
        sb.append(',')
        JsonCodec.appendString(sb, k)
        sb.append(':')
        append(sb, entries(k))
      }
      sb.append('}')
    case IntrinsicCondition(name, cond) =>
      sb.append("intrinsic(")
      JsonCodec.appendString(sb, name)
      sb.append(':')
      append(sb, cond)
      sb.append(')')
    case PartitionCondition(n, cond) =>
      sb.append("partition(").append(n).append(':')
      append(sb, cond)
      sb.append(')')
  }

  /** Deterministic (sorted) rendering of a value set. */
  private def appendValues(sb: java.lang.StringBuilder, vs: Set[JValue]): Unit = {
    var first = true
    vs.toSeq.sorted(JValue.CrossTypeOrdering).foreach { v =>
      if (!first) sb.append(',')
      first = false
      JsonCodec.append(sb, v)
    }
  }

  private def appendConditions(sb: java.lang.StringBuilder, cs: Seq[Condition]): Unit = {
    var first = true
    cs.foreach { c =>
      if (!first) sb.append(',')
      first = false
      append(sb, c)
    }
  }
}
