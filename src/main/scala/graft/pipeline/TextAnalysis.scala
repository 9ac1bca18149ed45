package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language id
 * (stopword heuristic), quality scoring, token counting, fingerprinting.
 * All pure column expressions (codegen'd, SQL-mirrorable for the oracle).
 */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** A BPE-ish subword count proxy: word-boundary pieces + digit runs +
    * punctuation marks each count as one token. */
  def subwordCount(textCol: Column): Column =
    size(filter(split(textCol, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= ""))

  /** Deterministic per-language stopword marker sets for the n-gram/stopword
    * language-id heuristic. Tiny on purpose: the operator shape (score per
    * language -> argmax) is what matters; swap in real lists in production. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Count of tokens belonging to a marker set. */
  def markerCount(textCol: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(textCol), t => array_contains(set, t)))
  }

  /** Heuristic language id: argmax of marker counts; ties and zero scores
    * fall back to "und" (undetermined). Deterministic: languages are scored
    * in sorted name order and strict > comparison keeps the first max.
    * Single tokenization pass ([[LangIdExpr]]); [[langIdBuiltin]] is the
    * equivalent builtin formulation used to cross-check it. */
  def langId(textCol: Column): Column = textExpressions.langId(textCol, stopwords)

  /** Builtin-only language id (one marker-count pass per language). */
  def langIdBuiltin(textCol: Column): Column = {
    val ordered = stopwords.toSeq.sortBy(_._1)
    val scored = ordered.map { case (lang, ms) => (lang, markerCount(textCol, ms)) }
    val best = scored.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }
    best._1
  }

  /** Quality metrics struct: lengths, ratios used for corpus filtering. */
  def charCount(textCol: Column): Column = length(textCol)

  def punctCount(textCol: Column): Column =
    length(textCol) - length(regexp_replace(textCol, "[.,;:!?]", ""))

  def punctRatio(textCol: Column): Column =
    punctCount(textCol).cast("double") / greatest(length(textCol), lit(1))

  def meanTokenLen(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(tokenCount(textCol), lit(1))

  def stopwordRatio(textCol: Column, markers: Seq[String]): Column =
    markerCount(textCol, markers).cast("double") / greatest(tokenCount(textCol), lit(1))

  /** Composite quality gate (thresholds typical of corpus filtering). */
  /** Single-pass acceptance test ([[QualityOkExpr]]); [[qualityOkBuiltin]]
    * is the builtin cross-check. */
  def qualityOk(textCol: Column, minTokens: Int = 10, maxMeanTokenLen: Double = 12.0,
                maxPunctRatio: Double = 0.2): Column =
    textExpressions.qualityOk(textCol, minTokens, maxMeanTokenLen, maxPunctRatio)

  def qualityOkBuiltin(textCol: Column, minTokens: Int = 10, maxMeanTokenLen: Double = 12.0,
                       maxPunctRatio: Double = 0.2): Column =
    (tokenCount(textCol) >= minTokens) &&
      (meanTokenLen(textCol) <= maxMeanTokenLen) &&
      (punctRatio(textCol) <= maxPunctRatio)

  /** Canonical-form fingerprint: md5 of the sorted distinct token set —
    * the classic key-collision fingerprint for clustering variants. */
  def fingerprint(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(textCol)))))

  /** 64-bit polynomial rolling hash over the token sequence (order
    * sensitive, unlike [[fingerprint]]): h = h*31 + xxhash64(token). */
  def rollingHash(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L), (acc, t) => acc * 31L + xxhash64(t))
}
