package graft.spark

import graft.pipeline.Html
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML-to-text extraction: goldens for every step class, entity decode
  * order, idempotence on plain text. */
class HtmlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extract(html: String): String = {
    val s = spark
    import s.implicits._
    Seq(html).toDF("h").select(Html.toText(col("h"))).head().getString(0)
  }

  test("golden: full document with script/style/comments/blocks/entities") {
    val html =
      """<html><head><title>T</title>
        |<script type="text/javascript">var x = 1 < 2 && 3 > 2;</script>
        |<style>.c { color: red }</style></head>
        |<body><!-- note --><h1>Header</h1>
        |<p>First &amp; second &lt;kept&gt;.</p>
        |<ul><li>one</li><li>two</li></ul>
        |<p>Tail&nbsp;text.</p></body></html>""".stripMargin
    val got = extract(html)
    assert(got.contains("Header\n"))
    assert(got.contains("First & second <kept>."))
    assert(got.contains("one\n"))
    assert(got.contains("Tail text."))
    // script/style/comment payloads gone entirely
    assert(!got.contains("var x") && !got.contains("color") && !got.contains("note"))
    assert(!got.contains("<p>") && !got.contains("</"))
  }

  test("entity order: &amp;lt; decodes to the literal text &lt;, not <") {
    assert(extract("a &amp;lt;b&amp;gt; c") === "a &lt;b&gt; c")
    assert(extract("x &lt;tag&gt; y") === "x <tag> y")
  }

  test("br/hr and block closers become line breaks; whitespace collapses") {
    assert(extract("a<br>b<br/>c<hr>d") === "a\nb\nc\nd")
    assert(extract("  <div> spaced   out </div>  ") === "spaced out")
    assert(extract("<p>a</p>\n\n\n\n<p>b</p>") === "a\n\n\nb" ||
           extract("<p>a</p>\n\n\n\n<p>b</p>") === "a\n\nb")
  }

  test("plain text is a fixed point; unclosed junk never throws") {
    val plain = "just ordinary text with no markup at all"
    assert(extract(plain) === plain)
    assert(extract(extract("<p>twice</p>")) === extract("<p>twice</p>"))
    // pathological inputs: unclosed tags, lone ampersands, partial entities
    Seq("<p unclosed", "a & b &amp c", "<script>never closed", "&lt").foreach { s =>
      extract(s) // must not throw
    }
  }

  test("oracleSql replays the identical steps in DuckDB syntax") {
    val sql = Html.oracleSql("t")
    assert(sql.startsWith("regexp_replace("))
    // every step present, newline replacements via chr(10), global flag
    assert(Html.Steps.forall { case (p, _) => sql.contains(p.replace("'", "''")) })
    assert(sql.contains("chr(10)") && sql.contains("'gs'"))
  }
}
