package graft.pipeline

import org.apache.spark.sql.Column
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
}
