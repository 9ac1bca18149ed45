package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-analysis as single-pass expressions.
 *
 * The builtin formulations in [[TextAnalysis]] (kept as *Builtin
 * cross-checks) re-tokenize the text once per metric — langId alone runs
 * five marker-count passes, and the curation filter stacks quality metrics
 * on top, each with its own regex split. These expressions compute the
 * same values in one tokenization per row; output parity with the builtin
 * (and hence the SQL oracle) is asserted in EngineSpec.
 */

/** Heuristic language id (argmax of stopword-marker counts; sorted language
  * order, strict >, zero score -> "und") — one tokenization pass. */
case class LangIdExpr(child: Expression, stopwords: Map[String, Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val langs: Array[String] = stopwords.keys.toArray.sorted
  // token -> bitmask of language indexes claiming it as a marker
  @transient private lazy val markerOf: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    for (i <- langs.indices; t <- stopwords(langs(i)))
      m.merge(t, 1 << i, (a, b) => a | b)
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val counts = new Array[Int](langs.length)
    var t = 0
    while (t < tokens.length) {
      val mask = markerOf.getOrDefault(tokens(t), 0)
      if (mask != 0) {
        var i = 0
        while (i < langs.length) {
          if ((mask & (1 << i)) != 0) counts(i) += 1
          i += 1
        }
      }
      t += 1
    }
    var best = -1
    var bestScore = 0
    var i = 0
    while (i < langs.length) {
      if (counts(i) > bestScore) { best = i; bestScore = counts(i) }
      i += 1
    }
    UTF8String.fromString(if (best < 0) "und" else langs(best))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Corpus-quality acceptance (token count, mean token length, punctuation
  * ratio) — one pass over chars + one tokenization. Matches the builtin
  * formulation exactly: tokens/lengths in code points over lower(trim(s)),
  * punctuation counted over the RAW string. */
case class QualityOkExpr(child: Expression, minTokens: Int,
                         maxMeanTokenLen: Double, maxPunctRatio: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    // punctuation over the raw string, in code points (UTF8String.numChars
    // semantics of the builtin length())
    val s = raw.toString
    var punct = 0
    var chars = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cp.toChar match {
        case '.' | ',' | ';' | ':' | '!' | '?' if Character.charCount(cp) == 1 => punct += 1
        case _ =>
      }
      chars += 1
      ci += Character.charCount(cp)
    }
    val tokens = SketchHash.tokenize(raw)
    var sumLen = 0L
    var t = 0
    while (t < tokens.length) {
      sumLen += tokens(t).codePointCount(0, tokens(t).length)
      t += 1
    }
    val nTokens = tokens.length
    val meanLen = sumLen.toDouble / math.max(nTokens, 1)
    val punctRatio = punct.toDouble / math.max(chars, 1)
    nTokens >= minTokens && meanLen <= maxMeanTokenLen && punctRatio <= maxPunctRatio
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object textExpressions {
  def langId(text: Column, stopwords: Map[String, Seq[String]]): Column =
    GraftBridge.column(LangIdExpr(GraftBridge.expression(text), stopwords))

  def qualityOk(text: Column, minTokens: Int, maxMeanTokenLen: Double,
                maxPunctRatio: Double): Column =
    GraftBridge.column(QualityOkExpr(GraftBridge.expression(text),
      minTokens, maxMeanTokenLen, maxPunctRatio))
}
