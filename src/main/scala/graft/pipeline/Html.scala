package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML-to-text extraction — the pre-content stage a crawl corpus needs
 * before any text operator runs (CommonCrawl WET-style): drop
 * script/style/comment payloads, turn block-level boundaries into
 * newlines, strip remaining tags, decode the common entities, normalize
 * whitespace.
 *
 * Implemented as one ordered (pattern, replacement) step list folded into
 * scan-local `regexp_replace` calls; [[oracleSql]] replays the IDENTICAL
 * steps as SQL text, so engine parity is by construction, not by parallel
 * maintenance (the [[Urls]] normalization pattern). Order matters and is
 * load-bearing:
 *  - script/style bodies go FIRST (their contents may contain `<`/`>`
 *    that would corrupt the generic tag strip);
 *  - `&lt;`-family entities decode BEFORE `&amp;`, so a literal
 *    `&amp;lt;` in the source decodes to the text `&lt;`, not to `<`;
 *  - whitespace collapses last, after tags have become separators.
 *
 * Regex dialect note: patterns stick to the Java-regex/RE2 common subset
 * (inline `(?is)` flags, non-greedy `.*?`, plain classes) so Spark and
 * DuckDB compile them identically.
 */
object Html {

  /** Ordered extraction steps, shared verbatim with the SQL oracle. */
  val Steps: Seq[(String, String)] = Seq(
    // non-content payloads first (contents may embed < and >)
    ("(?is)<(?:script|style)\\b[^>]*>.*?</(?:script|style)>", " "),
    ("(?s)<!--.*?-->", " "),
    // block boundaries become newlines so words don't concatenate
    ("(?i)<(?:br|hr)\\s*/?>", "\n"),
    ("(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)>", "\n"),
    // every remaining tag is a separator
    ("<[^>]*>", " "),
    // common entities; &amp; LAST (so &amp;lt; -> the literal text &lt;)
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    // whitespace normalization: runs of spaces, space around newlines,
    // 3+ newlines -> paragraph break, outer trim. Classes are spelled out
    // explicitly — \s differs between Java regex (includes \x0B vertical
    // tab) and RE2/DuckDB (excludes it), which would break engine parity
    ("[ \\t\\f\\r]+", " "),
    ("\\n ", "\n"), (" \\n", "\n"),
    ("\\n{3,}", "\n\n"),
    ("^[ \\t\\n\\f\\r]+", ""), ("[ \\t\\n\\f\\r]+$", ""))

  /** Extracted text Column — scan-local, codegen'd regexp chain. */
  def toText(html: Column): Column =
    Steps.foldLeft(html) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** DuckDB SQL applying the identical steps to `expr` (single-quoted SQL
    * literals; newline replacements via chr(10)). */
  def oracleSql(expr: String): String =
    Steps.foldLeft(expr) { case (acc, (p, r)) =>
      val pat = "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
      val repl =
        if (r == "\n") "chr(10)"
        else if (r == "\n\n") "chr(10) || chr(10)"
        else "'" + r.replace("'", "''") + "'"
      s"regexp_replace($acc, $pat, $repl, 'gs')"
    }
}
