package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text cleaning / PII redaction for training corpora: emails, URLs and
 * phone-number-shaped spans are replaced with typed placeholder tokens —
 * the standard pre-training scrub stage. Pure `regexp_replace` /
 * `regexp_count` column expressions (codegen'd, scan-local, no shuffle);
 * patterns are conservative by design (leftmost match, no catastrophic
 * backtracking, portable across regex engines for the oracle).
 */
object TextClean {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"

  /** Scrub order is fixed (URL -> email -> phone) so a URL containing
    * digits is redacted before the phone pattern can bite a fragment. */
  def scrub(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def emailCount(textCol: Column): Column = regexp_count(textCol, lit(EmailPattern))
  def urlCount(textCol: Column): Column = regexp_count(textCol, lit(UrlPattern))
  def phoneCount(textCol: Column): Column =
    regexp_count(regexp_replace(textCol, UrlPattern, "<URL>"), lit(PhonePattern))

  /** True when the document carries no redactable spans (the "publishable
    * as-is" filter). */
  def piiFree(textCol: Column): Column =
    emailCount(textCol) === 0 && urlCount(textCol) === 0 && phoneCount(textCol) === 0

  /** Within-document repeated-segment dedup: keep the FIRST occurrence of
    * each distinct trimmed segment (sentence by default) and drop later
    * repeats — the doc-local boilerplate/copy-paste cleaner. Pure
    * scan-local array work; first-occurrence semantics are pinned via the
    * indexed filter (`array_position(segs, s) == i`) so the oracle
    * expresses the identical rule. Returns the kept segments array. */
  def dedupedSegments(textCol: Column, sepRegex: String = "[.!?]"): Column = {
    val segs = TextAnalysis.segments(textCol, sepRegex)
    filter(segs, (s, i) => array_position(segs, s) === (i + 1).cast("long"))
  }

  /** Cross-document boilerplate removal: segments appearing in at least
    * `minDocs` DISTINCT documents are stripped from every document — the
    * web-curation step that kills "all rights reserved" lines. Returns
    * (idCol, n_segs, n_stripped, text_clean) with kept segments rejoined
    * by ". ".
    *
    * Scale shape: one (segment, doc)-distinct aggregate feeds a
    * doc-frequency count (map-side combinable, keyed by segment);
    * qualifying boilerplate is tiny by construction — a segment must
    * repeat across >= minDocs docs to qualify, and `maxBoilerplate` caps
    * the collected set (most-frequent first, deterministic tie-break) so
    * the driver/broadcast budget is bounded even on adversarial corpora.
    * The strip itself is a scan-local array filter against the broadcast
    * list: corpus rows never shuffle and never join. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Long, sepRegex: String = "[.!?]",
                       maxBoilerplate: Int = 100000): DataFrame = {
    val segsCol = TextAnalysis.segments(col(textCol), sepRegex)
    val boiler = boilerplateSegments(df, idCol, textCol, minDocs, sepRegex, maxBoilerplate)
    val kept = keptSegments(col(textCol), boiler, sepRegex)
    df.select(col(idCol),
      size(segsCol).cast("int").as("n_segs"),
      (size(segsCol) - size(kept)).cast("int").as("n_stripped"),
      array_join(kept, ". ").as("text_clean"))
  }

  /** The discovery half of [[stripBoilerplate]]: segments appearing in at
    * least `minDocs` distinct documents, most frequent first, capped. */
  def boilerplateSegments(df: DataFrame, idCol: String, textCol: String,
                          minDocs: Long, sepRegex: String = "[.!?]",
                          maxBoilerplate: Int = 100000): Seq[String] =
    df.select(col(idCol).as("__id"),
        explode(array_distinct(TextAnalysis.segments(col(textCol), sepRegex))).as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("seg").asc)
      .limit(maxBoilerplate)
      .collect().map(_.getString(0)).toSeq

  private def keptSegments(textCol: Column, boiler: Seq[String],
                           sepRegex: String): Column = {
    val segs = TextAnalysis.segments(textCol, sepRegex)
    if (boiler.isEmpty) segs
    // hash-SET membership, not array_contains over a plan-literal array:
    // per-segment cost is one hash probe regardless of |boiler| (a 100k
    // list under array_contains is 100k string compares per segment —
    // O(segments × |boiler|) over the corpus). Exact string equality, so
    // the oracle's NOT IN formulation is matched bit-for-bit.
    else filter(segs, s => !textExpressions.inStringSet(s, boiler))
  }

  /** The rewrite half: text with a known boilerplate list stripped,
    * segments rejoined by ". " — scan-local, so a curation runner can
    * replace the text column in place without any join. */
  def stripSegments(textCol: Column, boiler: Seq[String],
                    sepRegex: String = "[.!?]"): Column =
    array_join(keptSegments(textCol, boiler, sepRegex), ". ")
}
