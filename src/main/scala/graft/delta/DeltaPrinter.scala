package graft.delta

import graft.condition.ConditionPrinter
import graft.json._

/** Renders deltas back to DSL text (round-trips through the parser). */
object DeltaPrinter {

  def print(d: Delta): String = {
    val sb = new java.lang.StringBuilder
    append(sb, d)
    sb.toString
  }

  def append(sb: java.lang.StringBuilder, d: Delta): Unit = d match {
    case DeleteDelta => sb.append('~')
    case NoopDelta   => sb.append("..")
    case Literal(v)  => JsonCodec.append(sb, v)

    case MapDelta(entries, removeRest, deleteIfEmpty) =>
      sb.append('{')
      var first = true
      if (!removeRest) { sb.append(".."); first = false }
      entries.keys.toArray.sorted(JsonCodec.keyOrdering).foreach { k =>
        if (!first) sb.append(',')
        first = false
        JsonCodec.appendString(sb, k)
        sb.append(':')
        append(sb, entries(k))
      }
      sb.append('}')
      if (deleteIfEmpty) sb.append('?')

    case SetDelta(added, removed, removeRest, deleteIfEmpty) =>
      sb.append('(')
      var first = true
      if (!removeRest) { sb.append(".."); first = false }
      added.toSeq.sorted(JValue.CrossTypeOrdering).foreach { v =>
        if (!first) sb.append(',')
        first = false
        JsonCodec.append(sb, v)
      }
      removed.toSeq.sorted(JValue.CrossTypeOrdering).foreach { v =>
        if (!first) sb.append(',')
        first = false
        sb.append('~')
        JsonCodec.append(sb, v)
      }
      sb.append(')')
      if (deleteIfEmpty) sb.append('?')

    case ConditionalDelta(test, thenDelta, elseDelta) =>
      sb.append("if ")
      ConditionPrinter.append(sb, test)
      sb.append(" then ")
      append(sb, thenDelta)
      elseDelta match {
        case NoopDelta =>
        case ConditionalDelta(_, _, _) =>
          // print nested conditional as elif chain
          // "el" + "if c2 then d2 ... end" = "elif c2 then d2 ... end"
          sb.append(" el").append(DeltaPrinter.print(elseDelta))
          return
        case other =>
          sb.append(" else ")
          append(sb, other)
      }
      sb.append(" end")
  }
}
