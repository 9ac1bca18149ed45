package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Corpus-global segment-level deduplication with text RECONSTRUCTION — the
 * CCNet paragraph-dedup stage (Wenzek et al. 2020 §3.1: hash every
 * paragraph, drop paragraphs whose hash repeats across the corpus) adapted
 * to segment = disjoint token window so it also applies to corpora without
 * newline structure. Unlike [[Dedup.crossDocSpanStats]] (which only
 * REPORTS shared spans), this operator emits the cleaned text: each
 * document is re-assembled from its surviving segments in order.
 *
 * Relation to [[TextClean.stripBoilerplate]]: that operator targets the
 * top-k boilerplate REGIME — it collects a bounded, frequency-ranked
 * segment list to the driver and strips scan-locally, which is the right
 * shape when the condemned set is small (site chrome, legal footers). This
 * one is the full-dedup regime: the condemned set stays distributed (CCNet
 * removes EVERY repeated paragraph — at 100 TB that set does not fit on a
 * driver), at the cost of one extra hash-keyed join.
 *
 * Scale shape (the part that matters at 100 TB):
 *  - segmentation is scan-local (split → window slice → posexplode);
 *  - only (id, seg_idx, seg_hash) triples cross the first shuffle — never
 *    segment text;
 *  - the condemned-hash table (hashes seen in >= minDocs distinct docs) is
 *    produced by one hash-keyed aggregate and consumed by a hash-keyed
 *    left-semi join — boilerplate-heavy corpora make this table large, so
 *    it is NOT broadcast;
 *  - per-doc drop lists collapse to an int-array (doc_id, dropped_idxs)
 *    before the join back to the corpus — one small array per AFFECTED
 *    document. When few documents are affected that side broadcasts (AQE)
 *    and corpus text never moves; in the worst case (most docs carry
 *    dups) the corpus shuffles exactly once, on its id — the floor for
 *    any operator that must emit rewritten text per document;
 *  - reconstruction re-derives the segment array from the original text
 *    scan-locally and filters by index — document text itself never
 *    shuffles.
 */
/**
 * Single-pass document rebuild for segment dedup: tokenize, walk the
 * disjoint windows once, skip the dropped indexes, emit
 * (n_segs, n_dropped, clean_text). Replaces a stack of nested
 * higher-order functions (transform/filter/element_at) that Catalyst
 * evaluates interpreted per element — the measured hot spot of
 * [[Lines.dedupSegments]]'s final projection (~2s of a 3.5s sf0.1 query
 * before; the window arithmetic itself is trivial).
 *
 * Children: (text, droppedIdxs: array<int> nullable). Window semantics
 * are identical to [[Lines.segArray]]: starts at multiples of segSize,
 * the final window may be short, empty windows (empty doc) don't count.
 */
/** JVM-side replica of the Spark-side tokenization `split(trim(text),
  * "\\s+")` the hash operators use: Spark `trim` strips SPACES only (Java
  * String.trim strips all chars <= 0x20, eating leading '\n'/'\t') and
  * Spark `split` keeps trailing empty strings (Java's limit-0 split drops
  * them). Either divergence shifts window indexes between the hash side
  * and the rebuild side, dropping the WRONG segments. */
private[pipeline] object SparkToks {
  private val Ws = java.util.regex.Pattern.compile("\\s+") // per-row compile is the hot-path tax
  def apply(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    Ws.split(s.substring(b, e), -1)
  }
}

private[pipeline] case class SegmentRebuildExpr(left: Expression, right: Expression,
                                                segSize: Int)
    extends BinaryExpression with CodegenFallback {
  require(segSize > 0, s"segSize must be positive: $segSize")

  override def dataType: DataType = StructType(Seq(
    StructField("n_segs", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val textAny = left.eval(input)
    if (textAny == null) return null
    val dropAny = right.eval(input)
    val dropped: java.util.HashSet[Int] = new java.util.HashSet[Int]()
    if (dropAny != null) {
      val arr = dropAny.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { dropped.add(arr.getInt(i)); i += 1 }
    }
    val toks = SparkToks(textAny.asInstanceOf[UTF8String].toString)
    val sb = new java.lang.StringBuilder()
    var nSegs = 0
    var widx = 0
    var start = 0
    // mirror segArray: starts 0, segSize, ... while start <= max(nTok-1, 0)
    val lastStart = math.max(toks.length - 1, 0)
    while (start <= lastStart) {
      val end = math.min(start + segSize, toks.length)
      // the window text; a doc of "" tokenizes to [""] giving one empty seg
      var empty = true
      var t = start
      while (empty && t < end) { if (toks(t).nonEmpty) empty = false; t += 1 }
      if (!empty) {
        nSegs += 1
        if (!dropped.contains(widx)) {
          var u = start
          while (u < end) {
            if (toks(u).nonEmpty) { // boundary empties: no stray separators
              if (sb.length > 0) sb.append(' ')
              sb.append(toks(u))
            }
            u += 1
          }
        }
      }
      widx += 1
      start += segSize
    }
    InternalRow(nSegs, dropped.size(), UTF8String.fromString(sb.toString))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Single-pass duplicated-span removal: given the condemned window START
 * indexes of a document and the window length, mark every token covered
 * by some condemned window and emit the survivors —
 * (n_tokens, n_removed, clean_text). The unaligned companion of
 * [[SegmentRebuildExpr]]: spans may start anywhere, so coverage is an
 * interval union, not an index set.
 */
private[pipeline] case class SpanRemoveExpr(left: Expression, right: Expression,
                                            spanLen: Int)
    extends BinaryExpression with CodegenFallback {
  require(spanLen > 0, s"spanLen must be positive: $spanLen")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val textAny = left.eval(input)
    if (textAny == null) return null
    val toks = SparkToks(textAny.asInstanceOf[UTF8String].toString)
    val covered = new Array[Boolean](toks.length)
    val startsAny = right.eval(input)
    if (startsAny != null) {
      val arr = startsAny.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getInt(i)
        var t = s
        val end = math.min(s + spanLen, toks.length)
        while (t < end) { covered(t) = true; t += 1 }
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder()
    var removed = 0
    var t = 0
    while (t < toks.length) {
      if (covered(t)) removed += 1
      else if (toks(t).nonEmpty) {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks(t))
      }
      t += 1
    }
    InternalRow(toks.length, removed, UTF8String.fromString(sb.toString))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Lines {

  /** Case-preserving whitespace tokens (reconstruction must round-trip). */
  private def toks(textCol: org.apache.spark.sql.Column) =
    split(trim(textCol), "\\s+")

  /** Disjoint token windows of `size` as an array<string>; the final
    * window may be short. Empty docs yield a single "" segment which every
    * consumer filters out. */
  private def segArray(textCol: org.apache.spark.sql.Column, segSize: Int) = {
    val t = toks(textCol)
    transform(
      sequence(lit(0), greatest(size(t) - 1, lit(0)), lit(segSize)),
      s => concat_ws(" ", slice(t, s + 1, lit(segSize))))
  }

  /** (id, seg_idx, seg_hash) rows, scan-local; empty segments dropped. */
  def segmentHashes(df: DataFrame, idCol: String, textCol: String,
                    segSize: Int): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(segArray(col(textCol), segSize)).as(Seq("seg_idx", "seg")))
      .where(col("seg") =!= "")
      .select(col("id"), col("seg_idx"), xxhash64(col("seg")).as("seg_hash"))

  /**
   * Drop every segment whose hash occurs in >= `minDocs` DISTINCT
   * documents; rebuild each document from the survivors.
   *
   * Output: all input columns except `textCol`, plus
   *   n_segs      int     non-empty segments in the original document
   *   n_dropped   int     segments removed as corpus-wide duplicates
   *   clean_text  string  surviving segments joined by single spaces
   *                       ("" when everything was dropped)
   *
   * A segment repeated WITHIN one document does not condemn itself — the
   * count is distinct-documents, per CCNet (repetition inside a doc is a
   * quality signal, handled by [[TextAnalysis.repetitionStats]]).
   */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
                    segSize: Int = 5, minDocs: Int = 2): DataFrame = {
    require(segSize > 0, s"segSize must be positive: $segSize")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // the seg-hash table feeds two consumers (the condemned aggregate and
    // the drop-list join); persist it instead of re-scanning + re-exploding
    // the corpus per consumer — session-cached on purpose, see the Dedup
    // band table for the policy (localCheckpoint re-measured slower)
    val segs = segmentHashes(df, idCol, textCol, segSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val condemned = segs.groupBy("seg_hash")
      .agg(countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("seg_hash")
    rebuildWithoutSegments(df, idCol, textCol, segSize, condemned, segs)
  }

  /**
   * The rewrite half, shared with [[Incremental.incrementalSegDedup]]:
   * drop every segment of `df` whose hash appears in `condemned`
   * (a (seg_hash) frame from any discovery rule) and rebuild each
   * document from the survivors. `segsOpt` lets a caller that already
   * materialized the (id, seg_idx, seg_hash) table pass it in.
   */
  private[pipeline] def rebuildWithoutSegments(df: DataFrame, idCol: String,
      textCol: String, segSize: Int, condemned: DataFrame,
      segsOpt: DataFrame = null): DataFrame = {
    val segs = Option(segsOpt).getOrElse(segmentHashes(df, idCol, textCol, segSize))
    val dropIdx = segs.join(condemned, Seq("seg_hash"), "left_semi")
      .groupBy("id").agg(sort_array(collect_set(col("seg_idx"))).as("dropped_idxs"))
      .withColumnRenamed("id", "_drop_id")
    val joined = df.join(dropIdx, df(idCol) === col("_drop_id"), "left")
      .drop("_drop_id")
    val keep = df.columns.filterNot(_ == textCol).map(col)
    val rebuild = GraftBridge.column(SegmentRebuildExpr(
      GraftBridge.expression(col(textCol)),
      GraftBridge.expression(col("dropped_idxs")), segSize))
    joined
      .withColumn("_rb", rebuild)
      .select(keep :+
        col("_rb.n_segs").as("n_segs") :+
        col("_rb.n_dropped").as("n_dropped") :+
        col("_rb.clean_text").as("clean_text"): _*)
  }

  /** (id, start, span_hash) for EVERY sliding window of `spanLen` tokens —
    * case-preserving (reconstruction must round-trip), scan-local. Docs
    * shorter than `spanLen` contribute no rows. */
  def slidingSpanHashes(df: DataFrame, idCol: String, textCol: String,
                        spanLen: Int): DataFrame = {
    val t = toks(col(textCol))
    val starts = when(size(t) >= spanLen,
      sequence(lit(0), size(t) - spanLen)).otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"),
        posexplode(transform(starts,
          s => xxhash64(concat_ws(" ", slice(t, s + 1, lit(spanLen))))))
          .as(Seq("start", "span_hash")))
  }

  /**
   * Exact duplicated-SUBSTRING removal (the unaligned regime of Lee et al.
   * 2021, "Deduplicating Training Data Makes Language Models Better"):
   * every sliding `spanLen`-token window whose hash occurs in >=
   * `minDocs` DISTINCT documents is removed from ALL of them — spans can
   * start anywhere, so a copied paragraph embedded mid-document dies even
   * when [[dedupSegments]]' aligned windows straddle it. Coverage is the
   * interval union of condemned windows.
   *
   * Output: input columns except textCol, plus (n_tokens, n_removed,
   * clean_text).
   *
   * Scale shape: same as [[dedupSegments]] with ~spanLen× more hash rows
   * (one per token, not one per window) — still only (id, start, hash)
   * triples and per-doc int arrays through the shuffles; reconstruction
   * is the single-pass [[SpanRemoveExpr]].
   */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           spanLen: Int = 10, minDocs: Int = 2): DataFrame = {
    require(spanLen > 0, s"spanLen must be positive: $spanLen")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val spans = slidingSpanHashes(df, idCol, textCol, spanLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached, see Dedup band table
    val condemned = spans.groupBy("span_hash")
      .agg(countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("span_hash")
    val dropStarts = spans.join(condemned, Seq("span_hash"), "left_semi")
      .groupBy("id").agg(sort_array(collect_set(col("start"))).as("starts"))
      .withColumnRenamed("id", "_drop_id")
    val joined = df.join(dropStarts, df(idCol) === col("_drop_id"), "left")
      .drop("_drop_id")
    val keep = df.columns.filterNot(_ == textCol).map(col)
    val rebuild = GraftBridge.column(SpanRemoveExpr(
      GraftBridge.expression(col(textCol)),
      GraftBridge.expression(col("starts")), spanLen))
    joined.withColumn("_rb", rebuild)
      .select(keep :+
        col("_rb.n_tokens").as("n_tokens") :+
        col("_rb.n_removed").as("n_removed") :+
        col("_rb.clean_text").as("clean_text"): _*)
  }

  /**
   * Per-document n-gram novelty: how much of a document's (distinct) word
   * n-gram vocabulary appears NOWHERE else in the corpus. The inverse of a
   * contamination signal — high-novelty documents carry information the
   * corpus doesn't already have, low-novelty documents are recombinations
   * of corpus boilerplate (the documents Gopher-style repetition filters
   * miss because the repetition is ACROSS documents, not within one).
   *
   * Output: (idCol, n_grams, n_novel) — integer numerator/denominator; the
   * caller divides (kept exact here so results hash stably).
   *
   * Scale shape: per-doc distinct gram hashes come from the single-pass
   * [[sketches.hashedShingles]] expression; only (id, gram_hash) pairs
   * shuffle; the gram→doc-count aggregate is hash-keyed (counts, not
   * countDistinct — grams are already distinct per doc); novel grams
   * collapse back to per-doc counts before rejoining the id universe.
   */
  def noveltyStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(sketches.hashedShingles(col(textCol), n)).as("gram_hash"))
    val counts = grams.groupBy("gram_hash").agg(count(lit(1)).as("n_docs"))
    val novel = grams.join(counts.where(col("n_docs") === 1).select("gram_hash"),
        Seq("gram_hash"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_novel"))
    df.select(col(idCol).as("id"),
        size(sketches.hashedShingles(col(textCol), n)).as("n_grams"))
      .join(novel, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }
}
