package graft.engine

import graft.condition.{Condition, ConditionEvaluator, Conditions, IntrinsicsView}
import graft.json.JsonCodec
import graft.resolve.{DocRow, Iso8601}
import org.apache.spark.sql.Dataset

/** Document-level operations over resolved docs. */
object EmoDocs {

  def intrinsicsOf(d: DocRow): IntrinsicsView = IntrinsicsView(
    id = d.id, table = d.table, signature = d.signature, deleted = d.deleted,
    firstUpdateAt = if (d.first_update_ms == 0) null else Iso8601.format(d.first_update_ms),
    lastUpdateAt = if (d.last_update_ms == 0) null else Iso8601.format(d.last_update_ms),
    lastMutateAt = if (d.last_mutate_ms == 0) null else Iso8601.format(d.last_mutate_ms),
    placement = d.placement)

  /** Filter resolved docs with a condition DSL expression (exact parity
    * evaluator; the condition AST is parsed once and shipped in the task
    * closure). */
  def where(docs: Dataset[DocRow], conditionText: String): Dataset[DocRow] = {
    val cond: Condition = Conditions.fromString(conditionText)
    docs.filter { d =>
      ConditionEvaluator.eval(cond, JsonCodec.parseOrUndefined(d.body), intrinsicsOf(d))
    }
  }
}
