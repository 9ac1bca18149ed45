package graft.engine

import graft.condition.{Conditions, ConditionAlgebra, ConstantCondition}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rule: algebraically simplify embedded condition-DSL
 * predicates ([[EmoCondEval]]) before execution — constant conditions fold
 * to literals (letting Catalyst prune whole plan subtrees), and redundant
 * conjuncts/subsumed union branches are dropped via [[ConditionAlgebra]].
 * The DSL-level analog of Catalyst's BooleanSimplification, applied to the
 * opaque parity-evaluated expressions Catalyst cannot see into.
 */
object SimplifyEmoConditions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ EmoCondEval(text, children) =>
      val simplified = ConditionAlgebra.simplify(Conditions.fromString(text))
      simplified match {
        case ConstantCondition(b) => Literal(b)
        case other =>
          val newText = other.toString
          if (newText == text) e else EmoCondEval(newText, children)
      }
  }
}

/**
 * Session extensions: inject the condition-simplification rule and register
 * the engine's SQL functions. Enable with
 * `.config("spark.sql.extensions", "graft.engine.GraftExtensions")` or
 * `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimplifyEmoConditions)
  }
}

/** SQL-facing registration of the engine's functions, so the DSL surface is
  * reachable from `spark.sql(...)`:
  *
  *   SELECT ... WHERE emo_cond(body, '{..,"rating":ge(4)}')
  *   SELECT emo_partition(tbl, id, 8), emo_row_key(tbl, id) ...
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // emo_cond(body [, id, table], 'condition-dsl-text')
    reg.createOrReplaceTempFunction("emo_cond",
      exprs => {
        require(exprs.last.foldable, "emo_cond: the condition text must be a literal")
        EmoCondEval(exprs.last.eval(null).toString, exprs.init)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("emo_hash32",
      exprs => EmoHash32(exprs), "scala_udf")
    reg.createOrReplaceTempFunction("emo_simhash64",
      exprs => graft.pipeline.SimHash64Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("emo_json_type",
      exprs => EmoJsonType(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("emo_json_get",
      exprs => EmoJsonGet(exprs(0), exprs(1)), "scala_udf")
    // pipeline operators (literal int/double args are folded at plan time)
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
      require(e.foldable, "argument must be a literal")
      e.eval(null).asInstanceOf[Number].intValue
    }
    def litDouble(e: org.apache.spark.sql.catalyst.expressions.Expression): Double = {
      require(e.foldable, "argument must be a literal")
      e.eval(null) match {
        // SQL fractional literals (e.g. 0.2) parse as DecimalType
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue
      }
    }
    def litString(e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
      require(e.foldable, "argument must be a literal")
      e.eval(null).toString
    }
    def litBool(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
      require(e.foldable, "argument must be a literal")
      e.eval(null).asInstanceOf[Boolean]
    }
    reg.createOrReplaceTempFunction("emo_minhash",
      exprs => graft.pipeline.MinHashExpr(exprs(0), litInt(exprs(1)), litInt(exprs(2))),
      "scala_udf")
    reg.createOrReplaceTempFunction("emo_shingles",
      exprs => graft.pipeline.HashedShinglesExpr(exprs(0), litInt(exprs(1))),
      "scala_udf")
    reg.createOrReplaceTempFunction("emo_jaccard",
      exprs => graft.pipeline.SortedJaccardExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("emo_langid",
      exprs => graft.pipeline.LangIdExpr(exprs.head,
        graft.pipeline.TextAnalysis.stopwords), "scala_udf")
    reg.createOrReplaceTempFunction("emo_quality_ok",
      exprs => graft.pipeline.QualityOkExpr(exprs(0),
        if (exprs.length > 1) litInt(exprs(1)) else 10,
        if (exprs.length > 2) litDouble(exprs(2)) else 12.0,
        if (exprs.length > 3) litDouble(exprs(3)) else 0.2), "scala_udf")
    reg.createOrReplaceTempFunction("emo_repetition_stats",
      exprs => graft.pipeline.RepetitionStatsExpr(exprs.head), "scala_udf")
    // emo_nfc(text [, 'NFKC' [, strip_invisible]]): Unicode normalization
    reg.createOrReplaceTempFunction("emo_nfc",
      exprs => graft.pipeline.UnicodeNormalizeExpr(exprs.head,
        if (exprs.length > 1) litString(exprs(1)) else "NFC",
        exprs.length > 2 && litBool(exprs(2))), "scala_udf")
    // PII gates from raw catalyst nodes (the Column bridge would leave
    // unresolved function nodes that never re-analyze inside a registry-
    // substituted tree). RegExpCount is RuntimeReplaceable: the optimizer's
    // ReplaceExpressions pass lowers it after the registry inserts it.
    locally {
      import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo, Expression => CExpr, Literal => CLit, RegExpCount, RegExpReplace}
      import graft.pipeline.TextClean.{EmailPattern, PhonePattern, UrlPattern}
      def scrubExpr(e: CExpr): CExpr =
        RegExpReplace(RegExpReplace(RegExpReplace(e,
          CLit.create(UrlPattern), CLit.create("<URL>")),
          CLit.create(EmailPattern), CLit.create("<EMAIL>")),
          CLit.create(PhonePattern), CLit.create("<PHONE>"))
      def noMatch(e: CExpr, pat: String): CExpr =
        EqualTo(RegExpCount(e, CLit.create(pat)), CLit(0))
      reg.createOrReplaceTempFunction("emo_scrub",
        exprs => scrubExpr(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("emo_pii_free",
        exprs => CAnd(CAnd(noMatch(exprs.head, EmailPattern),
          noMatch(exprs.head, UrlPattern)),
          noMatch(RegExpReplace(exprs.head,
            CLit.create(UrlPattern), CLit.create("<URL>")), PhonePattern)),
        "scala_udf")
    }
    // databus event-key codec (EventKeyFormat parity)
    reg.createOrReplaceTempFunction("emo_event_key_encode",
      exprs => graft.streaming.EventKeyEncodeExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("emo_event_key_decode",
      exprs => graft.streaming.EventKeyDecodeExpr(exprs.head), "scala_udf")
    // O-Rison audit codec (RisonHelper parity)
    reg.createOrReplaceTempFunction("emo_to_orison",
      exprs => ToORisonExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("emo_from_orison",
      exprs => FromORisonExpr(exprs.head), "scala_udf")
    // emo_blocklist(text, array('w1','w2',...)) -> struct<n_blocked, n_tokens>
    reg.createOrReplaceTempFunction("emo_blocklist",
      exprs => {
        require(exprs(1).foldable, "emo_blocklist: the word list must be a literal array")
        val words = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        graft.pipeline.BlocklistStatsExpr(exprs.head, words)
      }, "scala_udf")
    // emo_fix_mojibake(text [, max_passes])
    reg.createOrReplaceTempFunction("emo_fix_mojibake",
      exprs => graft.pipeline.MojibakeRepairExpr(exprs.head,
        if (exprs.length > 1) litInt(exprs(1)) else 1), "scala_udf")
    reg.createOrReplaceTempFunction("emo_repetition_ok",
      exprs => graft.pipeline.RepetitionOkExpr(exprs(0),
        if (exprs.length > 1) litDouble(exprs(1)) else 0.20,
        if (exprs.length > 2) litDouble(exprs(2)) else 0.18,
        if (exprs.length > 3) litDouble(exprs(3)) else 0.30), "scala_udf")
    // DSIR feature expressions (round 5)
    reg.createOrReplaceTempFunction("emo_gram_hashes",
      exprs => graft.pipeline.GramHashesExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("emo_gram_buckets",
      exprs => graft.pipeline.GramBucketsExpr(exprs(0), litInt(exprs(1))), "scala_udf")
    // merge-able distinct-count sketch as a SQL aggregate (exact below k)
    reg.createOrReplaceTempFunction("emo_kmv_distinct",
      exprs => graft.pipeline.KmvDistinct(exprs.head,
        if (exprs.length > 1) litInt(exprs(1)) else 65536).toAggregateExpression(),
      "scala_udf")
    // the sketch itself (sorted k-min hash array) + two-sketch set
    // estimates: emo_kmv_setcounts(a, b [, k]) -> struct<n_a, n_b,
    // n_union, n_intersect>, exact below capacity
    reg.createOrReplaceTempFunction("emo_kmv_sketch",
      exprs => graft.pipeline.KmvSketchAgg(exprs.head,
        if (exprs.length > 1) litInt(exprs(1)) else 65536).toAggregateExpression(),
      "scala_udf")
    reg.createOrReplaceTempFunction("emo_kmv_setcounts",
      exprs => graft.pipeline.KmvSetCountsExpr(exprs(0), exprs(1)),
      "scala_udf")
    // SpaceSaving heavy hitters as a SQL aggregate (exact below capacity)
    reg.createOrReplaceTempFunction("emo_topk_sketch",
      exprs => graft.pipeline.SpaceSavingTopK(exprs.head, litInt(exprs(1)),
        if (exprs.length > 2) litInt(exprs(2)) else 4096).toAggregateExpression(),
      "scala_udf")
    // KLL quantile sketch as a SQL aggregate (exact below capacity):
    // emo_kll_quantiles(col, array(permilles...)[, capacity])
    reg.createOrReplaceTempFunction("emo_kll_quantiles",
      exprs => {
        val ps = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.CreateArray(kids, _) =>
            kids.map(litInt)
          case other => throw new IllegalArgumentException(
            s"emo_kll_quantiles: permilles must be an array literal, got $other")
        }
        graft.pipeline.KllQuantiles(exprs.head, ps,
          if (exprs.length > 2) litInt(exprs(2)) else 4096).toAggregateExpression()
      }, "scala_udf")
    // URL canonicalization from raw catalyst nodes (same bridge caveat as
    // the PII block), folded from the SAME step lists the Column API uses
    // (graft.pipeline.Urls) — parity is spec-asserted per fixture
    locally {
      import org.apache.spark.sql.catalyst.expressions.{Add, CaseWhen, Concat, EqualTo, Expression => CExpr, Length, Literal => CLit, Lower, RegExpExtract, RegExpReplace, StringTrim, Substring}
      import graft.pipeline.Urls
      def rre(e: CExpr, step: (String, String)): CExpr =
        RegExpReplace(e, CLit.create(step._1), CLit.create(step._2))
      def urlNormExpr(u0: CExpr): CExpr = {
        val cleaned = Urls.PreLowerSteps.foldLeft[CExpr](StringTrim(u0))(rre)
        val prefix = RegExpExtract(cleaned, CLit.create(Urls.PrefixRe), CLit(0))
        val rest = Substring(cleaned, Add(Length(prefix), CLit(1)), Length(cleaned))
        val lowered = CaseWhen(Seq((EqualTo(prefix, CLit.create("")), cleaned)),
          Some(Concat(Seq(Lower(prefix), rest))))
        Urls.PostLowerSteps.foldLeft[CExpr](lowered)(rre)
      }
      def hostExpr(u: CExpr): CExpr =
        RegExpExtract(u, CLit.create(Urls.HostRe), CLit(1))
      reg.createOrReplaceTempFunction("emo_url_normalize",
        exprs => urlNormExpr(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("emo_url_host",
        exprs => hostExpr(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("emo_url_domain",
        exprs => RegExpExtract(hostExpr(exprs.head),
          CLit.create(Urls.DomainRe), CLit(0)), "scala_udf")
    }
  }

  /** Column-API variant of `emo_cond` with the condition as a Scala string. */
  def emoCond(conditionText: String, body: Column): Column =
    expressions.emoCondEval(conditionText, body)
}
