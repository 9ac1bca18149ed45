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

  @transient private lazy val langs: Array[String] = {
    val ls = stopwords.keys.toArray.sorted
    // the per-token membership mask is a Long: beyond 64 languages the
    // bit 1L << i would alias mod 64 and SILENTLY credit markers to the
    // wrong language — fail loudly instead (an Int mask aliased at 33)
    require(ls.length <= 64,
      s"langId supports at most 64 languages per map, got ${ls.length}")
    ls
  }
  // token -> bitmask of language indexes claiming it as a marker; markers
  // fold through the SAME case fold the tokenizer applies (foldCase), so a
  // mixed-case marker cannot silently never-match the lowercased stream
  @transient private lazy val markerOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    for (i <- langs.indices; t <- stopwords(langs(i)))
      m.merge(SketchHash.foldCase(t), 1L << i, (a, b) => a | b)
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val counts = new Array[Int](langs.length)
    var t = 0
    while (t < tokens.length) {
      val boxed = markerOf.get(tokens(t))
      val mask: Long = if (boxed == null) 0L else boxed.longValue()
      if (mask != 0L) {
        var i = 0
        while (i < langs.length) {
          if ((mask & (1L << i)) != 0L) counts(i) += 1
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

/** Shared single-pass computation for the repetition signals: segment
  * duplicate counts and the most-frequent 2-/3-gram (count, code-point
  * length). Semantics are pinned to the builtin formulations in
  * [[TextAnalysis]] (trim = ASCII space only, tokens over lower(trim),
  * gram tie-break = UTF8-binary-smallest among max-count, lengths in code
  * points) — parity is asserted in CurationOpsSpec. */
private[pipeline] object RepetitionCore {
  final case class Stats(nSegs: Int, nDupSegs: Int, top2Cnt: Long,
                         top2Len: Int, top3Cnt: Long, top3Len: Int)

  private def stripSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  private def topNgram(tokens: Array[String], n: Int): (Long, Int) = {
    if (tokens.length < n) return (0L, 0)
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(tokens(i + j)); j += 1 }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var bestCnt = 0L
    var bestGram: String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val better = e.getValue > bestCnt ||
        (e.getValue == bestCnt && bestGram != null &&
          UTF8String.fromString(e.getKey).compareTo(UTF8String.fromString(bestGram)) < 0)
      if (better) { bestCnt = e.getValue; bestGram = e.getKey }
    }
    (bestCnt, if (bestGram == null) 0 else bestGram.codePointCount(0, bestGram.length))
  }

  def compute(raw: UTF8String): Stats = {
    val parts = textExpressions.SentenceSplit.split(raw.toString, -1)
    var nSegs = 0
    var dups = 0
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < parts.length) {
      val t = stripSpaces(parts(i))
      if (t.nonEmpty) { nSegs += 1; if (!seen.add(t)) dups += 1 }
      i += 1
    }
    val tokens = SketchHash.tokenize(raw)
    val (c2, l2) = topNgram(tokens, 2)
    val (c3, l3) = topNgram(tokens, 3)
    Stats(nSegs, dups, c2, l2, c3, l3)
  }
}

/** All repetition signals in one tokenization pass — struct<n_segs,
  * n_dup_segs, top2_cnt, top2_len, top3_cnt, top3_len>. The builtin chain
  * re-tokenizes per metric (two sorted-gram folds + a segment split). */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_segs", IntegerType, nullable = false),
    StructField("n_dup_segs", IntegerType, nullable = false),
    StructField("top2_cnt", LongType, nullable = false),
    StructField("top2_len", IntegerType, nullable = false),
    StructField("top3_cnt", LongType, nullable = false),
    StructField("top3_len", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val st = RepetitionCore.compute(input.asInstanceOf[UTF8String])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st.nSegs, st.nDupSegs, st.top2Cnt, st.top2Len, st.top3Cnt, st.top3Len))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass repetition acceptance gate (same thresholds semantics as
  * the builtin [[TextAnalysis.repetitionOkBuiltin]]: repeated-gram mass
  * only counts grams with cnt >= 2; fractions over code-point length). */
case class RepetitionOkExpr(child: Expression, maxTop2GramFrac: Double,
                            maxTop3GramFrac: Double, maxDupSegmentFrac: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val st = RepetitionCore.compute(raw)
    val chars = math.max(raw.numChars(), 1).toDouble
    val f2 = if (st.top2Cnt >= 2) st.top2Cnt * st.top2Len / chars else 0.0
    val f3 = if (st.top3Cnt >= 2) st.top3Cnt * st.top3Len / chars else 0.0
    val fSeg = st.nDupSegs.toDouble / math.max(st.nSegs, 1)
    f2 <= maxTop2GramFrac && f3 <= maxTop3GramFrac && fSeg <= maxDupSegmentFrac
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass bigram coverage against a fixed vocabulary —
  * struct<n_invocab_bigrams, n_oov_bigrams>. The builtin formulation
  * ([[LmScore.bigramCountsBuiltin]]) materializes every "w1 w2" gram via
  * O(n) slices and probes a literal array per gram — O(grams x vocab)
  * string compares; this walks the token array once with O(1) hash-set
  * probes. */
case class BigramCoverageExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_invocab_bigrams", IntegerType, nullable = false),
    StructField("n_oov_bigrams", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    // probe keys are tokens joined by ONE space, and the text side is
    // UTF8String-lowercased: normalize each entry the same way (split on
    // any whitespace, rejoin, same case fold) or a tab/doubled-space or
    // mixed-case entry silently never matches
    vocab.foreach(g =>
      s.add(SketchHash.foldCase(g.trim.split("\\s+").mkString(" "))))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    var inV = 0
    var oov = 0
    var i = 0
    while (i < tokens.length - 1) {
      if (vocabSet.contains(tokens(i) + " " + tokens(i + 1))) inV += 1 else oov += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](inV, oov))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** O(1) membership probe against a fixed string set — the scale-safe
  * replacement for `array_contains(array(lit...), x)`, whose plan-literal
  * array costs O(|set|) string compares PER PROBE (O(segments × |set|)
  * over a corpus for boilerplate stripping). The set rides in the
  * serialized plan exactly like the literal array did (shipped once per
  * executor via the broadcast task binary, not per task), but the probe is
  * a single hash lookup, so per-segment cost is independent of |set|.
  * Exact string semantics — no hashing false-positives. */
case class StringSetContainsExpr(child: Expression, strings: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  // UTF8String has value-based equals/hashCode, so probes need no decode
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](strings.size * 2)
    strings.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    set.contains(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Blocklist screening in one tokenization pass — struct<n_blocked,
  * n_tokens> (the C4-style badwords gate: filter/flag documents whose
  * blocked-token fraction crosses a threshold). O(1) hash probe per token
  * against the fixed word set; thresholding stays integer math caller-side
  * (n_blocked * 1000 vs n_tokens * permille) so the oracle is float-free. */
case class BlocklistStatsExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_blocked", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(SketchHash.foldCase(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    var blocked = 0
    var i = 0
    while (i < tokens.length) {
      if (set.contains(tokens(i))) blocked += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](blocked, tokens.length))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The boolean blocklist gate in ONE expression — semantically
  * `blocklistStats.n_blocked * 1000 <= blocklistStats.n_tokens * permille`
  * but emitted as a single node so a filter plan tokenizes each document
  * once (two `getField`s over a CodegenFallback struct are not reliably
  * subexpression-eliminated, doubling the tokenize+probe work in the gate
  * path). The threshold compare runs in Long, so a multi-billion-token
  * document can neither overflow-wrap (ANSI off) nor throw (ANSI on). */
case class BlocklistOkExpr(child: Expression, words: Seq[String], maxPermille: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPermille >= 0 && maxPermille <= 1000,
    s"maxPermille must be in [0, 1000]: $maxPermille")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(SketchHash.foldCase(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    var blocked = 0L
    var i = 0
    while (i < tokens.length) {
      if (set.contains(tokens(i))) blocked += 1
      i += 1
    }
    blocked * 1000L <= tokens.length.toLong * maxPermille
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unigram vocabulary coverage in one tokenization pass — struct<n_invocab,
  * n_oov> against a fixed (top-V, driver-sized) vocabulary. O(1) hash probe
  * per token; the builtin formulation ([[LmScore.vocabCountsBuiltin]],
  * literal-array `array_contains`) costs O(|vocab|) compares per token and
  * is kept only as the parity cross-check. Same probe-set shape as
  * [[BigramCoverageExpr]], one order of n-gram down. */
case class UnigramCoverageExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_invocab", IntegerType, nullable = false),
    StructField("n_oov", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    // tokenize() lowercases the text side, so a mixed-case vocab entry
    // could never match; fold the vocab through the SAME UTF8String case
    // fold (String.toLowerCase is default-locale — Turkish dotless-i
    // would silently diverge)
    vocab.foreach(w => s.add(SketchHash.foldCase(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    var inV = 0
    var i = 0
    while (i < tokens.length) {
      if (set.contains(tokens(i))) inV += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](inV, tokens.length - inV))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Mojibake repair (the ftfy core heuristic): text that is the Latin-1 /
  * windows-1252 misdecoding of UTF-8 bytes ("café" → "cafÃ©") is restored
  * by re-encoding its chars as Latin-1 bytes and strictly decoding them as
  * UTF-8. The repair applies ONLY when it is provably safe: every char is
  * <= 0xFF (so the Latin-1 re-encoding is lossless) AND the byte string is
  * valid UTF-8 containing at least one multibyte sequence (so the decode
  * is a real repair, not an ASCII no-op); otherwise the input passes
  * through untouched — clean text can never be corrupted. `maxPasses`
  * handles double-mojibake (misdecoded twice). Scan-local single pass. */
case class MojibakeRepairExpr(child: Expression, maxPasses: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPasses >= 1, s"maxPasses must be >= 1, got $maxPasses")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  private def repairOnce(s: String): String = {
    val bytes = MojibakeRepairExpr.misdecodeBytes(s)
    if (bytes == null) return s // not a cp1252/Latin-1 misdecode
    var hasHigh = false
    var i = 0
    while (i < bytes.length && !hasHigh) {
      if (bytes(i) < 0) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII: nothing to repair
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var p = 0
    var changed = true
    while (p < maxPasses && changed) {
      val r = repairOnce(s)
      changed = r != s
      s = r
      p += 1
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MojibakeRepairExpr {
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  // CharsetEncoder is stateful and not thread-safe: one per executor thread
  private val cp1252Encoder = ThreadLocal.withInitial(() =>
    Cp1252.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  /** The bytes the text was misdecoded FROM, or null if the text cannot be
    * a single-byte misdecode at all. windows-1252 first — the common
    * real-world form, where UTF-8 continuation bytes 0x80–0x9F surfaced as
    * punctuation (0x80 → €, 0x93/0x94 → smart quotes) — then Latin-1 for
    * the C1-control chars cp1252 has no byte for. The two charsets agree
    * everywhere else, so the order only decides who handles its own
    * exclusive range. */
  private[pipeline] def misdecodeBytes(s: String): Array[Byte] = {
    val enc = cp1252Encoder.get()
    enc.reset()
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      val arr = new Array[Byte](bb.remaining())
      bb.get(arr)
      arr
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        val n = s.length
        val bytes = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val c = s.charAt(i)
          if (c > 0xFF) return null
          bytes(i) = c.toByte
          i += 1
        }
        bytes
    }
  }
}

/** Ordered, NON-distinct word n-grams in ONE tokenization pass — output
  * parity with the builtin [[TextAnalysis.wordNgrams]] (whose
  * slice-per-gram formulation costs O(n²) array work per document; this
  * is the hot-path replacement for corpus-wide gram aggregates). */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String])
    val count = toks.length - n + 1
    if (count <= 0) {
      org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[UTF8String])
    } else {
      val out = new Array[UTF8String](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Unicode normalization as a codegen-capable expression: the canonical
 * pre-processing step every multilingual pipeline runs before hashing or
 * deduplicating text (NFC, per the W3C "Character Model" norm) — two
 * byte-different encodings of the same accented word must hash equal or
 * every dedup/decontamination operator silently misses them.
 *
 * `form` is one of NFC/NFD/NFKC/NFKD. Optional `stripInvisible` also
 * removes control characters (Cc except \t \n \r) and the zero-width
 * code points (U+200B..U+200D, U+FEFF) that survive normalization and
 * poison tokenization. Stays inside whole-stage codegen via a static
 * call — no CodegenFallback in the hot path.
 */
case class UnicodeNormalizeExpr(child: Expression, form: String,
                                stripInvisible: Boolean)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.normalize(
      input.asInstanceOf[UTF8String], form, stripInvisible)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.pipeline.UnicodeNormalizeExpr.normalize($c, "$form", $stripInvisible)""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeNormalizeExpr {
  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String, form: String, stripInvisible: Boolean): UTF8String = {
    val normalized = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form))
    if (!stripInvisible) return UTF8String.fromString(normalized)
    val sb = new java.lang.StringBuilder(normalized.length)
    var i = 0
    while (i < normalized.length) {
      val c = normalized.charAt(i)
      val drop =
        (Character.isISOControl(c) && c != '\t' && c != '\n' && c != '\r') ||
        (c >= 0x200B && c <= 0x200D) || c == 0xFEFF
      if (!drop) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object textExpressions {
  /** Precompiled sentence-boundary split (String.split would recompile the
    * regex per row in RepetitionCore's hot loop). */
  private[pipeline] val SentenceSplit = java.util.regex.Pattern.compile("[.!?]")

  def wordNgrams(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramsExpr(GraftBridge.expression(text), n))

  def inStringSet(text: Column, strings: Seq[String]): Column =
    GraftBridge.column(StringSetContainsExpr(GraftBridge.expression(text), strings))

  def blocklistStats(text: Column, words: Seq[String]): Column =
    GraftBridge.column(BlocklistStatsExpr(GraftBridge.expression(text), words))

  def blocklistOk(text: Column, words: Seq[String], maxPermille: Int): Column =
    GraftBridge.column(BlocklistOkExpr(GraftBridge.expression(text), words, maxPermille))

  def unigramCoverage(text: Column, vocab: Seq[String]): Column =
    GraftBridge.column(UnigramCoverageExpr(GraftBridge.expression(text), vocab))

  def fixMojibake(text: Column, maxPasses: Int = 1): Column =
    GraftBridge.column(MojibakeRepairExpr(GraftBridge.expression(text), maxPasses))

  def bigramCoverage(text: Column, vocab: Seq[String]): Column =
    GraftBridge.column(BigramCoverageExpr(GraftBridge.expression(text), vocab))

  def langId(text: Column, stopwords: Map[String, Seq[String]]): Column =
    GraftBridge.column(LangIdExpr(GraftBridge.expression(text), stopwords))

  def qualityOk(text: Column, minTokens: Int, maxMeanTokenLen: Double,
                maxPunctRatio: Double): Column =
    GraftBridge.column(QualityOkExpr(GraftBridge.expression(text),
      minTokens, maxMeanTokenLen, maxPunctRatio))

  def repetitionStats(text: Column): Column =
    GraftBridge.column(RepetitionStatsExpr(GraftBridge.expression(text)))

  def repetitionOk(text: Column, maxTop2GramFrac: Double, maxTop3GramFrac: Double,
                   maxDupSegmentFrac: Double): Column =
    GraftBridge.column(RepetitionOkExpr(GraftBridge.expression(text),
      maxTop2GramFrac, maxTop3GramFrac, maxDupSegmentFrac))

  def unicodeNormalize(text: Column, form: String = "NFC",
                       stripInvisible: Boolean = false): Column =
    GraftBridge.column(UnicodeNormalizeExpr(GraftBridge.expression(text),
      form, stripInvisible))
}
