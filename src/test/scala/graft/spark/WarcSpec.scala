package graft.spark

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.pipeline.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC container ingest/export: round-trip identity, HTTP envelope
  * parsing, multi-member gzip, quarantine on truncation/bad framing,
  * unicode payloads, streaming parser unit coverage. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("warcspec_").toString

  private def parseBytes(bytes: Array[Byte]): Seq[org.apache.spark.sql.Row] =
    Warc.parseStream("mem", new DataInputStream(
      new java.io.ByteArrayInputStream(bytes))).toSeq

  test("header names fold locale-independently (WARC-Record-ID under tr locale)") {
    val prior = java.util.Locale.getDefault
    try {
      // "WARC-Record-ID"/"WARC-Target-URI" contain 'I': a default-locale
      // fold under tr produces dotless-ı keys and the lowercase lookups
      // silently return null for both fields
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val rec = Warc.serializeRecord("conversion", "https://ex.org/tr",
        "2026-01-01T00:00:00Z", "text/plain", "hi".getBytes("UTF-8"))
      val rows = parseBytes(rec)
      assert(rows.size === 1)
      assert(rows.head.getString(3) === "https://ex.org/tr") // target_uri
      assert(rows.head.getString(2) != null)                 // record_id
      assert(rows.head.isNullAt(8))                          // not corrupt
    } finally java.util.Locale.setDefault(prior)
  }

  test("WET round-trip: write shards, read back identical text incl. unicode") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "unicode: éü中文 😀 mixed"),
      (3L, ""), // empty payload
      (4L, "line1\r\nline2\nline3"), // payload containing CRLFs (framing trap)
      (5L, "x" * 10000)
    ).toDF("doc_id", "text")
      .select(concat(lit("https://ex.org/d/"), col("doc_id")).as("uri"),
        lit("2026-01-02T03:04:05Z").as("date"), col("text"), col("doc_id"))
    val dir = tmpDir()
    Warc.writeWet(docs, dir, shards = 2)
    val back = Warc.readWarcClean(spark, dir)
      .select(regexp_extract(col("target_uri"), "/d/(\\d+)$", 1).cast("long").as("doc_id"),
        decode(col("payload"), "UTF-8").as("text"),
        col("warc_type"), col("warc_date"))
      .collect()
    assert(back.length === 5)
    val got = back.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "plain ascii text",
      2L -> "unicode: éü中文 😀 mixed", 3L -> "",
      4L -> "line1\r\nline2\nline3", 5L -> "x" * 10000))
    assert(back.forall(_.getString(2) == "conversion"))
    assert(back.forall(_.getString(3) == "2026-01-02T03:04:05Z"))
  }

  test("record ids are deterministic urn:uuid shapes; re-export is byte-identical") {
    val id1 = Warc.recordId("https://a", "2026-01-01T00:00:00Z")
    val id2 = Warc.recordId("https://a", "2026-01-01T00:00:00Z")
    assert(id1 === id2)
    assert(id1.matches("<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}>"))
    val r1 = Warc.serializeRecord("conversion", "https://a", "2026-01-01T00:00:00Z",
      "text/plain", "body".getBytes(UTF_8))
    val r2 = Warc.serializeRecord("conversion", "https://a", "2026-01-01T00:00:00Z",
      "text/plain", "body".getBytes(UTF_8))
    assert(java.util.Arrays.equals(r1, r2))
  }

  test("response records: HTTP envelope parsed into status + body") {
    val body = "<html>hello</html>".getBytes(UTF_8)
    val rec = Warc.serializeRecord("response", "https://ex.org/p",
      "2026-01-01T00:00:00Z", "application/http; msgtype=response",
      Warc.httpResponsePayload(body, "text/html"))
    val rows = parseBytes(rec)
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(1) === "response")
    assert(r.getInt(6) === 200)
    assert(new String(r.getAs[Array[Byte]](7), UTF_8) === "<html>hello</html>")
    assert(r.isNullAt(8))
  }

  test("response record without an HTTP envelope keeps the raw payload, not corrupt") {
    val rec = Warc.serializeRecord("response", "https://ex.org/p",
      "2026-01-01T00:00:00Z", "application/http; msgtype=response",
      "no http header here".getBytes(UTF_8))
    val rows = parseBytes(rec)
    assert(rows.length === 1)
    assert(rows.head.isNullAt(6)) // no status
    assert(new String(rows.head.getAs[Array[Byte]](7), UTF_8) === "no http header here")
    assert(rows.head.isNullAt(8))
  }

  test("quarantine: truncated payload reported, good prefix kept, parse stops") {
    val good = Warc.serializeRecord("conversion", "https://ok", "2026-01-01T00:00:00Z",
      "text/plain", "good".getBytes(UTF_8))
    val bad = Warc.serializeRecord("conversion", "https://bad", "2026-01-01T00:00:00Z",
      "text/plain", "this payload will be cut".getBytes(UTF_8))
    val bytes = good ++ bad.dropRight(14) // cut inside the payload
    val rows = parseBytes(bytes)
    assert(rows.length === 2)
    assert(rows(0).isNullAt(8))
    assert(new String(rows(0).getAs[Array[Byte]](7), UTF_8) === "good")
    assert(rows(1).getString(8) != null)
    assert(rows(1).getString(8).contains("truncated payload"))
    assert(rows(1).getString(3) === "https://bad") // fields parsed so far kept
  }

  test("quarantine: missing Content-Length and bad version line") {
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n").getBytes(UTF_8)
    val r1 = parseBytes(noLen)
    assert(r1.length === 1 && r1.head.getString(8).contains("Content-Length"))
    val badVer = "NOT-A-WARC oops\r\n".getBytes(UTF_8)
    val r2 = parseBytes(badVer)
    assert(r2.length === 1 && r2.head.getString(8).contains("bad version line"))
  }

  test("multi-member gzip files parse as a single record stream (CommonCrawl shape)") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "mm.warc.gz")
    val out = new java.io.FileOutputStream(f)
    Seq("a", "b", "c").foreach { t =>
      val buf = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(buf)
      gz.write(Warc.serializeRecord("conversion", s"https://ex.org/$t",
        "2026-01-01T00:00:00Z", "text/plain", t.getBytes(UTF_8)))
      gz.close()
      out.write(buf.toByteArray) // one member per record
    }
    out.close()
    val got = Warc.readWarcClean(spark, dir)
      .select(decode(col("payload"), "UTF-8")).collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("a", "b", "c"))
  }
}
