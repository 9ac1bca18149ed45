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

  /** Count of tokens belonging to a marker set — O(1) hash probe per token
    * ([[StringSetContainsExpr]] inside the filter lambda), so cost is
    * independent of |markers|. */
  def markerCount(textCol: Column, markers: Seq[String]): Column =
    size(filter(tokens(textCol), t => textExpressions.inStringSet(t, markers)))

  /** Heuristic language id: argmax of marker counts; ties and zero scores
    * fall back to "und" (undetermined). Deterministic: languages are scored
    * in sorted name order and strict > comparison keeps the first max.
    * Single tokenization pass ([[LangIdExpr]]); [[langIdBuiltin]] is the
    * equivalent builtin formulation used to cross-check it. */
  def langId(textCol: Column): Column = textExpressions.langId(textCol, stopwords)

  /** Builtin-only language id (one marker-count pass per language).
    * Membership stays literal-array `array_contains` HERE (not the hash
    * probe [[markerCount]] now uses) so this cross-check shares no custom
    * code with the expression it checks. */
  def langIdBuiltin(textCol: Column): Column = {
    val ordered = stopwords.toSeq.sortBy(_._1)
    val scored = ordered.map { case (lang, ms) =>
      // fold markers with the tokenizer's case fold (as the expression
      // does) so a mixed-case marker matches on BOTH formulations
      val set = array(ms.map(m => lit(sketches.foldMarker(m))): _*)
      (lang, size(filter(tokens(textCol), t => array_contains(set, t))))
    }
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

  /** 64-bit order-sensitive rolling hash over the token sequence (unlike
    * the order-blind [[fingerprint]]): h' = xxhash64(h, token), a seeded
    * hash chain. NOT h*31 + hash(token): checked long arithmetic under
    * ANSI (the Spark 4 default) throws ARITHMETIC_OVERFLOW on the first
    * full-range acc, which is every document of >= 2 tokens. */
  def rollingHash(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L), (acc, t) => xxhash64(acc, t))

  // ------------------------------------------------------------------
  // Repetition signals (the Gopher repetition filters, Rae et al. 2021
  // §A1.1): repetitious text is the strongest single low-quality marker
  // in web corpora. All single-pass column expressions — no explode, no
  // shuffle; the per-doc n-gram mode is a fold over the sorted gram list.

  /** Word n-grams in order, NON-distinct (unlike Dedup.wordShingles —
    * repetition counting needs the multiplicity). */
  def wordNgrams(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    val lastStart = size(toks) - n
    val idxs = when(lastStart >= 0, sequence(lit(0), lastStart))
      .otherwise(array().cast("array<int>"))
    transform(idxs, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Trimmed non-empty segments after splitting on a separator regex
    * (sentences by default; pass "\\n" for lines). */
  def segments(textCol: Column, sepRegex: String = "[.!?]"): Column =
    filter(transform(split(textCol, sepRegex), s => trim(s)), s => s =!= "")

  /** Fraction of segments that are repeats of an earlier segment. */
  def duplicateSegmentFraction(textCol: Column, sepRegex: String = "[.!?]"): Column = {
    val segs = segments(textCol, sepRegex)
    (size(segs) - size(array_distinct(segs))).cast("double") /
      greatest(size(segs), lit(1))
  }

  /** (cnt, gram) of the most frequent word n-gram; ties resolve to the
    * lexicographically smallest gram. One fold over the sorted gram list:
    * run lengths of equal adjacent grams ARE the gram counts, and strict >
    * keeps the first (smallest) gram reaching the max. */
  def topNgram(textCol: Column, n: Int): Column = {
    val sorted = array_sort(wordNgrams(textCol, n))
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best_cnt"), lit("").as("best_gram"))
    aggregate(sorted, init,
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        val better = run > st.getField("best_cnt")
        struct(g.as("prev"), run.as("run"),
          when(better, run).otherwise(st.getField("best_cnt")).as("best_cnt"),
          when(better, g).otherwise(st.getField("best_gram")).as("best_gram"))
      },
      st => struct(st.getField("best_cnt").as("cnt"),
        st.getField("best_gram").as("gram")))
  }

  /** Fraction of the document's characters covered by occurrences of its
    * most frequent word n-gram (cnt * len(gram) / len(text)). */
  def topNgramCharFraction(textCol: Column, n: Int): Column = {
    val t = topNgram(textCol, n)
    (t.getField("cnt") * length(t.getField("gram"))).cast("double") /
      greatest(length(textCol), lit(1))
  }

  /** [[topNgramCharFraction]] but 0 unless the gram actually REPEATS
    * (cnt >= 2): in a short doc every gram is unique and the "most
    * frequent" one can cover >20% of the text without any repetition. */
  def repeatedNgramCharFraction(textCol: Column, n: Int): Column = {
    val t = topNgram(textCol, n)
    when(t.getField("cnt") >= 2,
      (t.getField("cnt") * length(t.getField("gram"))).cast("double") /
        greatest(length(textCol), lit(1)))
      .otherwise(lit(0.0))
  }

  // Structural quality signals (the non-repetition Gopher rules, Rae et
  // al. 2021 §A1.1): symbol-to-word ratio, bullet/ellipsis line shapes,
  // alphabetic-token fraction. Pure builtins, scan-local.

  /** Count of '#' and unicode/ascii ellipsis marks — the symbol side of
    * Gopher's symbol-to-word ratio rule. */
  def symbolCount(textCol: Column): Column =
    (length(textCol) - length(regexp_replace(textCol, "#", ""))) +
      (length(regexp_replace(textCol, "\\.\\.\\.", "…")) -
        length(regexp_replace(regexp_replace(textCol, "\\.\\.\\.", "…"), "…", "")))

  /** Fraction of segments (sentences/lines) that start with a bullet
    * marker. */
  def bulletSegmentFraction(textCol: Column, sepRegex: String = "\n"): Column = {
    val segs = segments(textCol, sepRegex)
    size(filter(segs, s0 => s0.startsWith("-") || s0.startsWith("*") ||
      s0.startsWith("•"))).cast("double") / greatest(size(segs), lit(1))
  }

  /** Fraction of tokens containing at least one alphabetic character
    * (Gopher requires 80%+). */
  def alphaTokenFraction(textCol: Column): Column = {
    val toks = tokens(textCol)
    size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Structural acceptance gate with Gopher-style defaults. */
  def structureOk(textCol: Column, maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  minAlphaFrac: Double = 0.8): Column =
    (symbolCount(textCol).cast("double") /
      greatest(tokenCount(textCol), lit(1)) <= maxSymbolRatio) &&
      (bulletSegmentFraction(textCol) <= maxBulletFrac) &&
      (alphaTokenFraction(textCol) >= minAlphaFrac)

  /** All repetition signals in ONE tokenization pass ([[RepetitionStatsExpr]]):
    * struct<n_segs, n_dup_segs, top2_cnt, top2_len, top3_cnt, top3_len>.
    * The builtin formulations above re-tokenize per metric and are kept as
    * cross-checks (parity asserted in CurationOpsSpec). */
  def repetitionStats(textCol: Column): Column =
    textExpressions.repetitionStats(textCol)

  /** Composite repetition gate with Gopher-style default thresholds —
    * single-pass ([[RepetitionOkExpr]]); [[repetitionOkBuiltin]] is the
    * builtin cross-check. */
  def repetitionOk(textCol: Column, maxTop2GramFrac: Double = 0.20,
                   maxTop3GramFrac: Double = 0.18,
                   maxDupSegmentFrac: Double = 0.30): Column =
    textExpressions.repetitionOk(textCol, maxTop2GramFrac, maxTop3GramFrac,
      maxDupSegmentFrac)

  def repetitionOkBuiltin(textCol: Column, maxTop2GramFrac: Double = 0.20,
                          maxTop3GramFrac: Double = 0.18,
                          maxDupSegmentFrac: Double = 0.30): Column =
    (repeatedNgramCharFraction(textCol, 2) <= maxTop2GramFrac) &&
      (repeatedNgramCharFraction(textCol, 3) <= maxTop3GramFrac) &&
      (duplicateSegmentFraction(textCol) <= maxDupSegmentFrac)
}
