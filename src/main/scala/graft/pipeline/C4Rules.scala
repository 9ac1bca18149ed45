package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * C4-style line and page filters (Raffel et al., "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer", 2020, §2.2 —
 * the cleaning recipe behind the C4 corpus, reused by most later web
 * pipelines):
 *
 *   line rules — keep a line iff it ends in terminal punctuation, has at
 *   least `minWords` words, and does not mention "javascript" (the cookie
 *   / enable-JS boilerplate tell);
 *
 *   page rules — drop the whole page if it contains "lorem ipsum"
 *   (template placeholder), any curly brace (code/JSON leakage), or fewer
 *   than `minLines` surviving lines.
 *
 * Everything is a scan-local string/regexp expression over the line split
 * — no shuffle, no UDF, and every predicate is expressible identically in
 * the DuckDB oracle (list_filter + regexp), so the cleaned text is
 * md5-pinned end to end.
 */
object C4Rules {

  /** terminal sentence punctuation, with C4's closing-quote allowance */
  private[pipeline] val TerminalRe = "[.!?\"']$"

  /** Line-level keep predicate. Word count uses the repo-wide whitespace
    * idiom; an all-whitespace line trims to "" and fails the word gate. */
  def lineKept(line: Column, minWords: Int = 5): Column = {
    val t = trim(line)
    t.rlike(TerminalRe) &&
      size(split(t, "\\s+")) >= minWords &&
      !lower(line).contains("javascript")
  }

  /** Lines of a page that survive the line rules, in order. */
  def keptLines(textCol: Column, minWords: Int = 5): Column =
    filter(split(textCol, "\n"), l => lineKept(l, minWords))

  /** Page-level gate over the ORIGINAL text plus the kept-line count:
    * no lorem ipsum, no curly braces, at least `minLines` survivors. */
  def pageKept(textCol: Column, keptCol: Column, minLines: Int = 3): Column =
    !lower(textCol).contains("lorem ipsum") &&
      !textCol.contains("{") &&
      size(keptCol) >= minLines

  /** The full per-page report: line counts, the page verdict, and the
    * cleaned text (kept lines rejoined with newlines). Columns:
    * n_lines, n_kept, page_kept (int 0/1), text_clean. */
  def cleanPage(textCol: Column, minWords: Int = 5, minLines: Int = 3): Column = {
    val kept = keptLines(textCol, minWords)
    struct(
      size(split(textCol, "\n")).as("n_lines"),
      size(kept).as("n_kept"),
      pageKept(textCol, kept, minLines).cast("int").as("page_kept"),
      array_join(kept, "\n").as("text_clean"))
  }
}
