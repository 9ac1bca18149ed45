package graft.engine

import graft.condition._
import graft.json._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles condition DSL trees to native Catalyst [[Column]] predicates
 * when the target schema allows it (SURVEY §2.2 "Spark primitive" column).
 *
 * The key insight making this exact: with a KNOWN static column type, the
 * reference's type-strict equality and long/double promotion asymmetry are
 * decidable at compile time — e.g. `equal(3)` against a DoubleType column
 * is constant-false (3L != 3.0 under Objects.equals), while `gt(2.5)`
 * against a LongType column promotes numerically. What the schema cannot
 * express (UNDEFINED-vs-null on schemaless bodies) stays on the parity
 * evaluator path ([[expressions.emoCondEval]]).
 *
 * Compiled predicates are plain Catalyst expressions, so filter pushdown,
 * partition pruning and whole-stage codegen all apply.
 */
object ConditionCompiler {

  /** Compile against a DataFrame row treated as the JSON object: map-condition
    * keys are columns. Missing columns evaluate as UNDEFINED statically. */
  def compileRow(cond: Condition, df: DataFrame,
                 intrinsics: Map[String, Column] = Map.empty): Column = {
    val schema = df.schema
    cond match {
      case MapCondition(entries) =>
        entries.map { case (k, sub) =>
          schema.find(_.name == k) match {
            case Some(f) => compileField(sub, df(k), f.dataType, intrinsics)
            case None    => staticEval(sub, JUndefined)
          }
        }.foldLeft(lit(true))(_ && _)
      case AndCondition(cs) => cs.map(compileRow(_, df, intrinsics)).foldLeft(lit(true))(_ && _)
      case OrCondition(cs)  => cs.map(compileRow(_, df, intrinsics)).foldLeft(lit(false))(_ || _)
      case NotCondition(c)  => !coalesce(compileRow(c, df, intrinsics), lit(false))
      case ConstantCondition(b) => lit(b)
      case IntrinsicCondition(name, sub) => compileIntrinsic(name, sub, intrinsics)
      case PartitionCondition(n, sub) =>
        val part = expressions.emoPartition(intrinsics(Intrinsic.Table), intrinsics(Intrinsic.Id), n)
        compileField(sub, part, IntegerType, intrinsics)
      case other =>
        throw new IllegalArgumentException(s"condition not applicable to a row: $other")
    }
  }

  /** Compile a condition applied to a single typed column. */
  def compileField(cond: Condition, col: Column, dt: DataType,
                   intrinsics: Map[String, Column] = Map.empty,
                   mayBeUndefined: Boolean = false): Column = cond match {

    case ConstantCondition(b) => lit(b)

    case EqualCondition(v) =>
      if (mayBeUndefined) col.isNotNull && equalTyped(col, dt, v)
      else equalTyped(col, dt, v)

    case InCondition(vs) =>
      // via EqualCondition so the mayBeUndefined guard applies per value —
      // in(null, ...) must NOT match an absent field (JUndefined != JNull)
      vs.toSeq.map(v => compileField(EqualCondition(v), col, dt, intrinsics,
        mayBeUndefined)).foldLeft(lit(false))(_ || _)

    case IsCondition(state) =>
      import State._
      state match {
        // a schema column is always present — unless the caller marked it
        // as possibly-undefined (NULL column value = absent field, e.g. the
        // ~tags pseudo-field which only exists when an event carries tags)
        case UNDEFINED => if (mayBeUndefined) col.isNull else lit(false)
        case DEFINED   => if (mayBeUndefined) col.isNotNull else lit(true)
        // with null-means-absent there is no representation of a present
        // JSON null, so is(null) can never hold
        case NULL      => if (mayBeUndefined) lit(false) else col.isNull
        case BOOL      => boolOf(dt == BooleanType, col)
        case NUM       => boolOf(isNumeric(dt), col)
        case STRING    => boolOf(dt == StringType, col)
        case ARRAY     => boolOf(dt.isInstanceOf[ArrayType], col)
        case OBJECT    => boolOf(dt.isInstanceOf[StructType] || dt.isInstanceOf[MapType], col)
      }

    case ComparisonCondition(op, v) =>
      // null comparison results are equivalent to false at WHERE position;
      // the NOT case re-establishes null-is-false explicitly, so raw
      // predicates stay pushdown-eligible
      val cmp: Option[Column] = (dt, v) match {
        case (t, JLong(n)) if isNumeric(t)   => Some(applyCmp(op, col, lit(n)))
        case (t, JDouble(n)) if isNumeric(t) => Some(applyCmp(op, col, lit(n)))
        case (StringType, JString(s)) =>
          // Catalyst compares strings in UTF-8 byte order; the reference
          // (and the parity evaluator) use Java UTF-16 code-unit order.
          // The two agree whenever the literal stays below U+D800 — above
          // it (surrogates / private use / specials) they can disagree, so
          // such comparisons are not natively compilable: fail loudly and
          // let fallback-capable callers route to the parity path
          if (s != null && s.exists(_ >= '\uD800'))
            throw new UnsupportedOperationException(
              "string comparison against a literal containing chars >= U+D800 " +
                "is not natively compilable (UTF-8 vs UTF-16 order divergence); " +
                "evaluate via the parity path")
          Some(applyCmp(op, col, lit(s)))
        case _                               => None // mixed types never match
      }
      cmp.getOrElse(lit(false))

    case lc @ LikeCondition(pattern) =>
      if (dt != StringType) lit(false)
      else col.like(globToSqlLike(pattern))

    case NotCondition(c) =>
      // reference semantics: inner null (e.g. like() on a null field) is
      // FALSE, so its negation must be TRUE — coalesce exactly here, where
      // Spark's three-valued NOT would otherwise drop the row.
      // mayBeUndefined THREADS THROUGH (as in and/or/in): dropping it
      // compiled not({..,"~tags":is(undefined)}) to constant true, so
      // composite conditions on absent-capable fields diverged from the
      // parity evaluator (spurious or dropped fanout deliveries)
      !coalesce(compileField(c, col, dt, intrinsics, mayBeUndefined), lit(false))

    case AndCondition(cs) =>
      cs.map(compileField(_, col, dt, intrinsics, mayBeUndefined))
        .foldLeft(lit(true))(_ && _)

    case OrCondition(cs) =>
      cs.map(compileField(_, col, dt, intrinsics, mayBeUndefined))
        .foldLeft(lit(false))(_ || _)

    case MapCondition(entries) =>
      dt match {
        case st: StructType =>
          val fieldChecks = entries.map { case (k, sub) =>
            st.find(_.name == k) match {
              case Some(f) => compileField(sub, col.getField(k), f.dataType, intrinsics)
              case None    => staticEval(sub, JUndefined)
            }
          }
          fieldChecks.foldLeft(col.isNotNull)(_ && _)
        case _: MapType =>
          // a MapType column IS a JSON object, but per-key lookup with
          // UNDEFINED-vs-null semantics is not decidable from the static
          // schema (every key "exists" with a null-or-value). FAIL LOUDLY
          // like object equality: compiling to constant false silently
          // dropped every matching row; fallback-capable callers demote
          // to the parity evaluator
          throw new UnsupportedOperationException(
            "map-condition on a MapType column is not natively compilable " +
              "— evaluate via the parity path (emoCondEval)")
        case _ => lit(false) // a non-object value never matches {..}
      }

    case ContainsCondition(condValues, containment) =>
      import Containment._
      dt match {
        case _ if condValues.isEmpty && containment != ONLY => lit(true)
        case ArrayType(et, _) =>
          // JSON null literals are legal members (the evaluator matches a
          // null array element); the set-function builtins mishandle null
          // elements, so null membership tests explicitly via exists()
          val (nullReq, nonNull) = condValues.toSeq.partition(_ == JNull)
          val typed = nonNull.filter(v => literalMatchesType(v, et))
          val litsArr = array(typed.map(jlit): _*)
          val nullMember = exists(col, _.isNull)
          containment match {
            case ANY =>
              val base =
                if (typed.isEmpty) lit(false)
                else arrays_overlap(col, litsArr)
              if (nullReq.nonEmpty) base || nullMember else base
            case ALL =>
              if (typed.size < nonNull.size) lit(false) // untyped value can't be contained
              else {
                val base =
                  if (typed.isEmpty) lit(true) // only null requirements
                  else size(array_except(litsArr, col)) === 0
                if (nullReq.nonEmpty) base && nullMember else base
              }
            case ONLY =>
              if (typed.size < nonNull.size) lit(false)
              else {
                // array_distinct keeps one null, so the size check counts it
                val base =
                  (if (typed.isEmpty) lit(true)
                   else size(array_except(litsArr, col)) === 0) &&
                    size(array_distinct(col)) === (typed.size + nullReq.size)
                if (nullReq.nonEmpty) base && nullMember else base
              }
          }
        case _ => lit(false) // value is not a list
      }

    case IntrinsicCondition(name, sub) => compileIntrinsic(name, sub, intrinsics)

    case PartitionCondition(n, sub) =>
      val part = expressions.emoPartition(intrinsics(Intrinsic.Table), intrinsics(Intrinsic.Id), n)
      compileField(sub, part, IntegerType, intrinsics)
  }

  private def compileIntrinsic(name: String, sub: Condition,
                               intrinsics: Map[String, Column]): Column = {
    require(intrinsics.nonEmpty, "May not reference intrinsic values from this context.")
    require(name != Intrinsic.Version, "~version is not supported in conditions (by design)")
    val c = intrinsics.getOrElse(name,
      throw new UnsupportedOperationException(name))
    val dt = name match {
      case Intrinsic.Deleted => BooleanType
      case _                 => StringType
    }
    compileField(sub, c, dt, intrinsics)
  }

  // ------------------------------------------------------------------ helpers

  /** Type-strict equality resolved statically per the column type. */
  private def equalTyped(col: Column, dt: DataType, v: JValue): Column = v match {
    case JNull      => col.isNull
    case JLong(n)   => dt match {
      case LongType | IntegerType | ShortType | ByteType => colEq(col, lit(n))
      case _ => lit(false) // 3 != 3.0 and != "3"
    }
    case JDouble(n) => dt match {
      case DoubleType | FloatType => colEq(col, lit(n))
      case _ => lit(false)
    }
    case JString(s) => if (dt == StringType) colEq(col, lit(s)) else lit(false)
    case JBool(b)   => if (dt == BooleanType) colEq(col, lit(b)) else lit(false)
    case JArr(items) => dt match {
      // null elements are legal JSON array members — type them explicitly
      // (an untyped lit(null) breaks array() element-type resolution)
      case ArrayType(et, _) if items.forall(v => v == JNull || literalMatchesType(v, et)) =>
        colEq(col, array(items.map {
          case JNull => lit(null).cast(et)
          case v     => jlit(v)
        }: _*))
      case _ => lit(false)
    }
    case JObj(_) => dt match {
      // object equality against a struct/map column is order-insensitive
      // deep equality — not expressible as a Catalyst literal compare.
      // FAIL LOUDLY: compiling to constant false silently excluded every
      // matching row; callers needing this route through the parity
      // evaluator (emoCondEval) instead.
      case _: StructType | _: MapType =>
        throw new UnsupportedOperationException(
          "object equality on a struct/map column is not natively " +
            "compilable — evaluate via the parity path (emoCondEval)")
      case _ => lit(false) // non-object column never equals an object
    }
    case JUndefined => lit(false)
  }

  private def colEq(col: Column, v: Column): Column = col === v

  private def boolOf(b: Boolean, col: Column): Column =
    if (b) col.isNotNull else lit(false)

  private def applyCmp(op: Comparison.Comparison, l: Column, r: Column): Column = {
    import Comparison._
    op match {
      case GT => l > r
      case GE => l >= r
      case LT => l < r
      case LE => l <= r
    }
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  private def literalMatchesType(v: JValue, dt: DataType): Boolean = (v, dt) match {
    case (JLong(_), LongType | IntegerType | ShortType | ByteType) => true
    case (JDouble(_), DoubleType | FloatType) => true
    case (JString(_), StringType) => true
    case (JBool(_), BooleanType) => true
    case _ => false
  }

  private def jlit(v: JValue): Column = v match {
    case JLong(n)   => lit(n)
    case JDouble(n) => lit(n)
    case JString(s) => lit(s)
    case JBool(b)   => lit(b)
    case JNull      => lit(null)
    case other      => throw new IllegalArgumentException(s"not a scalar literal: $other")
  }

  /** Evaluate a sub-condition against a static value at compile time
    * (e.g. a missing column is UNDEFINED for every row). */
  private def staticEval(c: Condition, v: JValue): Column =
    lit(ConditionEvaluator.eval(c, v))

  /** Translate the condition glob to SQL LIKE via the SAME unescaping as
    * the evaluator (LikeCondition.unescape: backslash escapes any next
    * char): unescaped `*` -> `%`; literal `%`/`_`/`\` escaped. */
  def globToSqlLike(pattern: String): String = {
    val u = graft.condition.LikeCondition.unescape(pattern)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < u.chars.length) {
      if (u.isWildcard(i)) sb.append('%')
      else u.chars(i) match {
        case '%'  => sb.append("\\%")
        case '_'  => sb.append("\\_")
        case '\\' => sb.append("\\\\")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
