package graft.spark

import graft.pipeline.Urls
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization + per-domain curation (round 5). */
class UrlsSpec extends AnyFunSuite {

  test("urlDedup: URLs normalizing to empty are missing, never 'the same page'") {
    val s = spark
    import s.implicits._
    // "", whitespace, and fragment-only URLs all normalize to "" — grouping
    // them would collapse every un-URL'd document onto one survivor
    val df = Seq(
      (1L, "https://a.example/x"),
      (2L, "https://a.example/x#frag"), // true duplicate of 1
      (3L, ""),
      (4L, "   "),
      (5L, "#only-a-fragment")).toDF("id", "url")
    val groups = Urls.urlDedup(df, "id", "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups.size === 1)
    assert(groups("https://a.example/x") === ((1L, 2L)))
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def norm(url: String): String = {
    val s = spark
    import s.implicits._
    Seq(url).toDF("u").select(Urls.normalize(col("u"))).head.getString(0)
  }

  test("normalize: each documented rule") {
    // 1. trim
    assert(norm("  https://example.com/a  ") === "https://example.com/a")
    // 2. fragment
    assert(norm("https://example.com/a#frag") === "https://example.com/a")
    // 3. tracking params — middle, first, only, mixed with kept params
    assert(norm("https://e.com/p?id=3&utm_source=x&y=2") === "https://e.com/p?id=3&y=2")
    assert(norm("https://e.com/p?utm_campaign=x&id=3") === "https://e.com/p?id=3")
    assert(norm("https://e.com/p?gclid=abc") === "https://e.com/p")
    assert(norm("https://e.com/p?fbclid=1&msclkid=2&ref=hn") === "https://e.com/p")
    // 3b. params merely ENDING in a tracking name, or tracking-shaped path
    // segments, are untouched (the [?&] anchor)
    assert(norm("https://e.com/p?href=a") === "https://e.com/p?href=a")
    assert(norm("https://e.com/p?pref=1&id=2") === "https://e.com/p?pref=1&id=2")
    assert(norm("https://e.com/ref=abc/page") === "https://e.com/ref=abc/page")
    // 4. default ports stripped, non-default kept, cross-scheme kept
    assert(norm("http://e.com:80/a") === "http://e.com/a")
    assert(norm("https://e.com:443/a") === "https://e.com/a")
    assert(norm("https://e.com:8443/a") === "https://e.com:8443/a")
    assert(norm("http://e.com:443/a") === "http://e.com:443/a")
    // 5. scheme+host lowercased, path case preserved
    assert(norm("HTTPS://ExAmple.COM/CaseSensitive/Path") ===
      "https://example.com/CaseSensitive/Path")
    // 6. www stripped (host label only)
    assert(norm("https://www.example.com/a") === "https://example.com/a")
    assert(norm("https://notwww.example.com/a") === "https://notwww.example.com/a")
    // 7. trailing slashes (all of them — single-slash stripping would make
    // "path//" non-idempotent)
    assert(norm("https://example.com/a/") === "https://example.com/a")
    assert(norm("https://example.com/") === "https://example.com")
    assert(norm("https://example.com/a//") === "https://example.com/a")
    // combined (the path-final "/" survives: only a string-final slash is
    // stripped — "/Item/?q" vs "/Item?q" equivalence is server-dependent,
    // so the conservative rule keeps it)
    assert(norm(" HTTP://WWW.Shop.Example.COM:80/Item/?utm_source=mail&id=7#top ") ===
      "http://shop.example.com/Item/?id=7")
  }

  test("normalize is idempotent on varied messy inputs") {
    val s = spark
    import s.implicits._
    val messy = Seq(
      "  https://example.com/a  ", "HTTP://E.COM:80/x?utm_source=a&b=1#f",
      "https://www.a.b.co:443/p/?gclid=z", "http://x.io/p?a=1&utm_medium=m&c=2",
      "ftp://weird.example/z", "not a url at all", "",
      "https://e.com/p?utm_a=1&utm_b=2&utm_c=3", "https://E.com//double//slash/",
      "https://e.com/deep/path///", "https://e.com/p?href=x&utm_y=2")
    val once = messy.toDF("u").select(Urls.normalize(col("u")).as("n1"))
    val twice = once.select(col("n1"), Urls.normalize(col("n1")).as("n2"))
    twice.collect().foreach(r => assert(r.getString(0) === r.getString(1),
      s"not idempotent on ${r.getString(0)}"))
  }

  test("PROPERTY: idempotence + invariants on randomly generated messy URLs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59)
    def gen(): String = {
      val scheme = Seq("http://", "HTTP://", "https://", "HTTPS://", "HtTpS://")(rnd.nextInt(5))
      val www = Seq("", "www.", "WWW.")(rnd.nextInt(3))
      val host = Seq("a.Example.COM", "sub.dom.example.org", "X9.io")(rnd.nextInt(3))
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/p", "/A/B", "/p/", "/x//y///")(rnd.nextInt(5))
      val q = Seq("", "?id=1", "?utm_source=a", "?id=1&utm_b=2&c=3", "?href=z&ref=t",
        "?gclid=g&gclid=h")(rnd.nextInt(6))
      val frag = Seq("", "#f", "#Sec-2")(rnd.nextInt(3))
      val pad = Seq("", " ", "  ")(rnd.nextInt(3))
      pad + scheme + www + host + port + path + q + frag + pad
    }
    val urls = Seq.fill(300)(gen())
    val rows = urls.toDF("u").select(col("u"),
      graft.pipeline.Urls.normalize(col("u")).as("n1"))
      .select(col("u"), col("n1"), graft.pipeline.Urls.normalize(col("n1")).as("n2"))
      .collect()
    rows.foreach { r =>
      val (u, n1, n2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(n1 === n2, s"not idempotent on <$u>")
      assert(!n1.contains("#"), s"fragment survived in <$n1>")
      assert(!n1.matches(".*[?&](utm_[A-Za-z]+|gclid|fbclid|msclkid|ref)=.*"),
        s"tracking param survived in <$n1>")
      assert(!n1.endsWith("/"), s"trailing slash in <$n1>")
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*".r.findFirstIn(n1).foreach { pre =>
        assert(pre === pre.toLowerCase, s"uppercase authority in <$n1>")
      }
    }
  }

  test("PROPERTY: registeredDomainFast equals registeredDomain(normalize(u))") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61)
    def gen(): String = {
      // non-http(s) schemes pin the www-strip scope: the full chain keeps
      // `www.` outside https?://, so the fast path must too
      val scheme = Seq("http://", "HTTP://", "https://", "HTTPS://",
        "HtTpS://", "ftp://", "FTP://", "s3://")(rnd.nextInt(8))
      val www = Seq("", "www.", "WWW.")(rnd.nextInt(3))
      val host = Seq("a.Example.COM", "sub.dom.example.org", "X9.io",
        "u@pw.example.net", "single", "www.example")(rnd.nextInt(6))
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/p", "/A/B", "/p/")(rnd.nextInt(4))
      val q = Seq("", "?id=1", "?utm_source=a&b=2")(rnd.nextInt(3))
      val frag = Seq("", "#Frag")(rnd.nextInt(2))
      val pad = Seq("", " ")(rnd.nextInt(2))
      pad + scheme + www + host + port + path + q + frag + pad
    }
    val urls = Seq.fill(400)(gen()) ++ Seq("not a url", "")
    urls.toDF("u")
      .select(col("u"),
        Urls.registeredDomain(Urls.normalize(col("u"))).as("full"),
        Urls.registeredDomainFast(col("u")).as("fast"))
      .collect().foreach { r =>
        assert(r.getString(1) === r.getString(2), s"mismatch on <${r.getString(0)}>")
      }
  }

  test("host and registeredDomain") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("https://a.b.example.co/p", "a.b.example.co", "example.co"),
      ("https://example.com", "example.com", "example.com"),
      ("https://user@example.com/p", "example.com", "example.com"),
      ("https://e.com:8443/p", "e.com", "e.com"),
      ("plain text", "", ""))
    rows.toDF("u", "wantHost", "wantDom")
      .select(Urls.host(col("u")).as("h"), Urls.registeredDomain(col("u")).as("d"),
        col("wantHost"), col("wantDom"))
      .collect().foreach { r =>
        assert(r.getString(0) === r.getString(2))
        assert(r.getString(1) === r.getString(3))
      }
  }

  test("urlDedup keeps the smallest id per normalized URL with counts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "https://e.com/a"), (2L, "https://E.COM/a/"), (3L, "https://e.com/a?utm_source=x"),
      (4L, "https://e.com/b"), (5L, "http://other.org/c#f")).toDF("id", "url")
    val got = Urls.urlDedup(df, "id", "url").orderBy("url_norm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("http://other.org/c", 5L, 1L),
      ("https://e.com/a", 1L, 3L),
      ("https://e.com/b", 4L, 1L)))
  }

  test("capPerDomain bounds every domain and is deterministic") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i => (i, s"https://d${i % 3}.example$i.com/p$i"))
      .map { case (i, _) =>
        // 3 domains: big.com gets 30 pages, small.com 8, tiny.org 2
        val dom = if (i <= 30) "big.com" else if (i <= 38) "small.com" else "tiny.org"
        (i, s"https://www.$dom/page/$i")
      }.toDF("id", "url")
    val capped = Urls.capPerDomain(df, "id", "url", n = 5)
    val byDom = capped.groupBy("domain").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byDom === Map("big.com" -> 5L, "small.com" -> 5L, "tiny.org" -> 2L))
    val again = Urls.capPerDomain(df.repartition(7), "id", "url", n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === capped.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("domainProfile integer outputs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "https://a.com/x"), (2L, "https://a.com/x/"), (3L, "https://a.com/y"),
      (4L, "https://b.net/z")).toDF("id", "url")
    val got = Urls.domainProfile(df, "id", "url").orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a.com", 3L, 2L, 1L), ("b.net", 1L, 1L, 4L)))
  }

  test("ruleVerdict: longest prefix wins, allow wins ties, no match allows, null kept") {
    val s = spark
    import s.implicits._
    val rules = Seq(
      Urls.UrlRule("a.com", "/private/", allow = false),
      Urls.UrlRule("a.com", "/private/blog/", allow = true),
      Urls.UrlRule("a.com", "/tie/", allow = false),
      Urls.UrlRule("a.com", "/tie/", allow = true),
      Urls.UrlRule("b.com", "/", allow = false))
    val df = Seq(
      Some("https://a.com/private/x"),      // blocked
      Some("https://a.com/private/blog/x"), // longer allow wins
      Some("https://a.com/tie/x"),          // equal length -> allow wins
      Some("https://a.com/open/x"),         // no match -> allowed
      Some("https://b.com/anything"),       // host-wide block
      Some("https://c.com/private/x"),      // other host: rules don't apply
      None                                   // null url kept
    ).toDF("url")
    val kept = Urls.applyRules(df, "url", rules)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(kept === Set(Some("https://a.com/private/blog/x"),
      Some("https://a.com/tie/x"), Some("https://a.com/open/x"),
      Some("https://c.com/private/x"), None))
  }

  test("PROPERTY: ruleVerdict matches a naive longest-match reference on random URLs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(71)
    val hosts = Vector("h0.com", "h1.com", "h2.com")
    val segs = Vector("a", "b", "c")
    val rules = (0 until 12).map { _ =>
      val depth = rnd.nextInt(3)
      val prefix = "/" + (0 until depth).map(_ => segs(rnd.nextInt(3)) + "/").mkString
      Urls.UrlRule(hosts(rnd.nextInt(3)), prefix, rnd.nextBoolean())
    }
    val urls = (0 until 300).map { _ =>
      val depth = rnd.nextInt(4)
      s"https://${hosts(rnd.nextInt(3))}/" +
        (0 until depth).map(_ => segs(rnd.nextInt(3)) + "/").mkString + "page"
    }
    def naive(u: String): Boolean = {
      val host = u.stripPrefix("https://").takeWhile(_ != '/')
      val path = u.stripPrefix("https://" + host)
      val m = rules.filter(r => r.host == host && path.startsWith(r.pathPrefix))
      if (m.isEmpty) true
      else {
        val maxLen = m.map(_.pathPrefix.length).max
        m.filter(_.pathPrefix.length == maxLen).exists(_.allow)
      }
    }
    val got = urls.toDF("url")
      .select(col("url"), Urls.ruleVerdict(col("url"), rules).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1))
    got.foreach { case (u, v) => assert(v === naive(u), u) }
  }
}
