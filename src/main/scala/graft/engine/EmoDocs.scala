package graft.engine

import graft.condition._
import graft.json.JsonCodec
import graft.resolve.{DocRow, Iso8601}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Document-level operations over resolved docs. */
object EmoDocs {

  def intrinsicsOf(d: DocRow): IntrinsicsView = IntrinsicsView(
    id = d.id, table = d.table, signature = d.signature, deleted = d.deleted,
    firstUpdateAt = if (d.first_update_ms == 0) null else Iso8601.format(d.first_update_ms),
    lastUpdateAt = if (d.last_update_ms == 0) null else Iso8601.format(d.last_update_ms),
    lastMutateAt = if (d.last_mutate_ms == 0) null else Iso8601.format(d.last_mutate_ms),
    placement = d.placement)

  /** ISO-8601 UTC render of an epoch-ms column. Zone-free integer epoch
    * arithmetic, NOT date_format(timestamp_millis(...)): date_format
    * applies the SESSION timezone to TimestampType, so a non-UTC session
    * would emit local wall-clock digits with a literal 'Z' and silently
    * diverge from the Iso8601(UTC) strings the parity evaluator and
    * Resolver produce (timestamp intrinsic conditions would then disagree
    * between the native and parity paths). All codegen'd builtins. */
  private def isoCol(msCol: Column): Column = {
    val days = floor(msCol / 86400000L) // exact: |ms| << 2^53
    val rem = (msCol - days * 86400000L).cast("long")
    def pad2(c: Column) = lpad(c.cast("string"), 2, "0")
    val date = date_add(to_date(lit("1970-01-01")), days.cast("int"))
    when(msCol === 0L, lit(null).cast("string"))
      .otherwise(concat(
        date.cast("string"), lit("T"),
        pad2(floor(rem / 3600000L)), lit(":"),
        pad2(floor(rem / 60000L) % 60), lit(":"),
        pad2(floor(rem / 1000L) % 60), lit("."),
        lpad((rem % 1000L).cast("string"), 3, "0"), lit("Z")))
  }

  /** Intrinsic pseudo-columns of a docs frame (ISO-8601 date strings). */
  def intrinsicColumns(df: DataFrame): Map[String, Column] = Map(
    Intrinsic.Id -> df("id"),
    Intrinsic.Table -> df("table"),
    Intrinsic.Signature -> df("signature"),
    Intrinsic.Deleted -> df("deleted"),
    Intrinsic.FirstUpdateAt -> isoCol(df("first_update_ms")),
    Intrinsic.LastUpdateAt -> isoCol(df("last_update_ms")),
    Intrinsic.LastMutateAt -> isoCol(df("last_mutate_ms")),
    Intrinsic.Placement -> df("placement"))

  /** True when the condition only touches intrinsics / partitions (no
    * document-body fields) — compilable to native Catalyst predicates. */
  private def intrinsicOnly(c: Condition): Boolean = c match {
    case _: IntrinsicCondition | _: PartitionCondition | _: ConstantCondition => true
    case AndCondition(cs) => cs.forall(intrinsicOnly)
    case OrCondition(cs)  => cs.forall(intrinsicOnly)
    case NotCondition(i)  => intrinsicOnly(i)
    case _ => false
  }

  /** The filter predicate for a condition over a docs DataFrame: top-level
    * conjuncts touching only intrinsics compile to native Catalyst columns
    * (pushdown + codegen); the rest evaluates via the exact-parity
    * expression on the JSON body. */
  def predicate(df: DataFrame, conditionText: String): Column = {
    val cond = ConditionAlgebra.simplify(Conditions.fromString(conditionText))
    val conjuncts = cond match {
      case AndCondition(cs) => cs
      case c                => Seq(c)
    }
    val (nativeCandidates, parity0) = conjuncts.partition(intrinsicOnly)
    val intr = intrinsicColumns(df)
    // a conjunct the compiler rejects (e.g. a string comparison whose
    // literal crosses the UTF-8/UTF-16 order divergence) demotes to the
    // exact parity evaluator instead of failing the whole predicate
    val compiled = nativeCandidates.map { c =>
      try Right(ConditionCompiler.compileRow(c, df, intr))
      catch { case _: UnsupportedOperationException => Left(c) }
    }
    val nativeCol = compiled.collect { case Right(col) => col }
      .foldLeft(lit(true))(_ && _)
    val parity = parity0 ++ compiled.collect { case Left(c) => c }
    if (parity.isEmpty) nativeCol
    else {
      val parityText = Conditions.and(parity).toString
      nativeCol && expressions.emoCondEvalFull(parityText,
        df("body"), df("id"), df("table"), df("signature"), df("deleted"),
        isoCol(df("first_update_ms")), isoCol(df("last_update_ms")),
        isoCol(df("last_mutate_ms")), df("placement"))
    }
  }

  /** Filter resolved docs with a condition DSL expression. */
  def where(docs: Dataset[DocRow], conditionText: String): Dataset[DocRow] = {
    import docs.sparkSession.implicits._
    val df = docs.toDF()
    df.where(predicate(df, conditionText)).as[DocRow]
  }

  def whereDf(docs: DataFrame, conditionText: String): DataFrame =
    docs.where(predicate(docs, conditionText))

  /** True when the condition depends only on the COORDINATE — ~table, ~id
    * and partitions (functions of the coordinate) — so it commutes with the
    * resolve fold: filtering the change log first folds only matching
    * documents. Conservative: other intrinsics (~version, ~deleted,
    * timestamps) are fold RESULTS and must not be pushed. */
  private def coordinateOnly(c: Condition): Boolean = c match {
    case IntrinsicCondition(Intrinsic.Table | Intrinsic.Id, _) => true
    case _: PartitionCondition | _: ConstantCondition => true
    case AndCondition(cs) => cs.forall(coordinateOnly)
    case OrCondition(cs)  => cs.forall(coordinateOnly)
    case NotCondition(i)  => coordinateOnly(i)
    case _ => false
  }

  /** Resolve-with-predicate-pushdown: top-level conjuncts that depend only
    * on the coordinate filter the CHANGE LOG before the fold's shuffle, so
    * only matching documents are folded at all (the generalization of the
    * point-get key pushdown, and the dominant cost saver for selective
    * scans at placement scale); the full condition still applies after the
    * fold for exactness. */
  def resolveWhere(changes: DataFrame, conditionText: String,
                   placement: String = "default"): Dataset[DocRow] = {
    val cond = ConditionAlgebra.simplify(Conditions.fromString(conditionText))
    val conjuncts = cond match {
      case AndCondition(cs) => cs
      case c                => Seq(c)
    }
    val pushable = conjuncts.filter(coordinateOnly)
    val preIntr = Map(
      Intrinsic.Table -> changes("table"),
      Intrinsic.Id -> changes("key"))
    // a conjunct the compiler rejects (e.g. a comparison literal crossing
    // the UTF-8/UTF-16 order divergence) is simply dropped from the
    // pushdown set — the post-fold where() below applies the FULL
    // condition exactly, so pushdown is an optimization, never required
    val pre = pushable
      .flatMap { c =>
        try Some(ConditionCompiler.compileRow(c, changes, preIntr))
        catch { case _: UnsupportedOperationException => None }
      }
      .foldLeft(lit(true))(_ && _)
    where(graft.resolve.ResolveEngine.resolve(changes.where(pre), placement),
      conditionText)
  }
}
