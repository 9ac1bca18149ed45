package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + per-domain curation for web-scraped corpora — the
 * CCNet/RefinedWeb-style stage that runs BEFORE content dedup: normalize
 * each document's URL, drop exact URL duplicates (keeping the first
 * fetch), and cap or gate per registered domain so no single site
 * dominates the training mix.
 *
 * Normalization is a fixed pipeline of regexp/string steps, each chosen to
 * be expressible identically in other engines (the DuckDB oracle mirrors
 * every rule):
 *
 *   1. trim surrounding whitespace
 *   2. drop the fragment (`#...`)
 *   3. drop tracking query params (`utm_*`, `gclid`, `fbclid`, `msclkid`,
 *      `ref`) and re-tidy `?`/`&` separators
 *   4. drop scheme-default ports (`http://h:80`, `https://h:443`)
 *   5. lowercase the scheme and authority (path/query case is preserved —
 *      it is significant on most servers)
 *   6. drop a leading `www.` host label
 *   7. drop trailing `/`s (all of them — idempotence)
 *
 * All steps are scan-local codegen'd column expressions: no shuffle, no
 * UDF, safe to run inside the parquet scan projection at any scale.
 */
object Urls {

  /** The (pattern -> replacement) regexp steps BEFORE the prefix-lowercase
    * step, in application order — shared verbatim with the SQL registry
    * (`emo_url_normalize` builds raw catalyst nodes from this list, so the
    * two surfaces cannot drift). The tracking-param pattern is anchored to
    * a [?&] separator (kept via $1) so a param merely ENDING in a tracking
    * name (href=, pref=) or a path segment containing "ref=" is never
    * touched. */
  private[graft] val PreLowerSteps: Seq[(String, String)] = Seq(
    "#.*$" -> "",
    "([?&])(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref)=[^&#]*" -> "$1",
    // tidy: "?&" -> "?", "&&"+ -> "&", then a dangling "?" or "&" at end
    "\\?&+" -> "?",
    "&&+" -> "&",
    "[?&]+$" -> "",
    "(?i)^(http://[^/:?#]+):80([/?#]|$)" -> "$1$2",
    "(?i)^(https://[^/:?#]+):443([/?#]|$)" -> "$1$2")

  /** Steps after the prefix-lowercase: www strip, then ALL trailing
    * slashes after a non-slash char (one-at-a-time stripping would break
    * idempotence on "path//"; no lookbehind — RE2-portable). */
  private[graft] val PostLowerSteps: Seq[(String, String)] = Seq(
    "^(https?://)www\\." -> "$1",
    "([^/])/+$" -> "$1")

  /** scheme://authority prefix (the region the lowercase step covers). */
  private[graft] val PrefixRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** capture group 1 = host (authority minus port/userinfo). */
  private[graft] val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

  /** last two host labels. */
  private[graft] val DomainRe = "[^.]+\\.[^.]+$"

  /** The full normalization pipeline (steps 1-7). Idempotent:
    * `normalize(normalize(u)) == normalize(u)` (spec-asserted). */
  def normalize(url: Column): Column = {
    val cleaned = PreLowerSteps.foldLeft(trim(url)) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    // lowercase scheme://authority only; the rest of the string is untouched
    val prefix = regexp_extract(cleaned, PrefixRe, 0)
    val withLower = when(prefix === "", cleaned).otherwise(
      concat(lower(prefix), cleaned.substr(length(prefix) + 1, length(cleaned))))
    PostLowerSteps.foldLeft(withLower) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
  }

  /** Host (authority minus port/userinfo) of a normalized URL. */
  def host(url: Column): Column = regexp_extract(url, HostRe, 1)

  /** Registered domain approximation: the last two host labels
    * (`a.b.example.co` -> `example.co`). Public-suffix-list precision is a
    * data problem, not an engine problem; two labels is the standard
    * corpus-curation default. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), DomainRe, 0)

  /** `registeredDomain(normalize(url))` without the full normalize chain:
    * of the seven normalization steps only case-folding and the `www.`
    * strip can change the HOST (fragments, tracking params, ports and
    * trailing slashes live outside the [[HostRe]] capture), so extracting
    * the host first and folding it directly is equivalent for domain
    * purposes at a third of the regex work — the hot path for link-graph
    * edge extraction, where every href needs a domain but nothing else.
    * Equivalence is property-tested against the full chain (UrlsSpec).
    * The `www.` strip mirrors [[PostLowerSteps]] exactly: it applies ONLY
    * to http(s) URLs — a bare-scheme host like `ftp://www.example` keeps
    * its `www` label in the full chain, so the fast path must too. */
  def registeredDomainFast(url: Column): Column = {
    val t = trim(url)
    val h = lower(host(t))
    val stripped = when(t.rlike("(?i)^https?://"),
      regexp_replace(h, "^www\\.", "")).otherwise(h)
    regexp_extract(stripped, DomainRe, 0)
  }

  /**
   * Exact URL dedup: one survivor per normalized URL — the smallest id
   * (first fetch under monotone ids) — plus the duplicate count. Rows with
   * a NULL url are exempt (a missing URL is not "the same page" as every
   * other missing URL — grouping them would collapse the whole un-URL'd
   * corpus onto one survivor). Single hash aggregate keyed by the
   * normalized URL; at 100 TB this is the same shape as exact text dedup
   * (map-side combine, no row ever carries text).
   */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.where(col(urlCol).isNotNull)
      .select(normalize(col(urlCol)).as("url_norm"), col(idCol))
      .groupBy("url_norm")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))
      // a URL that NORMALIZES to "" (blank, whitespace, fragment-only) is
      // missing, not "the same page" — grouping them would collapse every
      // un-URL'd document onto one survivor, the same hazard as null.
      // Filtered AFTER the aggregate (one row per distinct URL): a pre-agg
      // filter pushes through the projection and re-evaluates the whole
      // 9-regex normalize chain per row — measured 2x on the scan
      .where(col("url_norm") =!= "")

  /**
   * Per-domain cap: keep at most `n` documents per registered domain — a
   * deterministic md5-uniform sample (not "first n", which would bias
   * toward crawl order). Delegates to the bounded-heap
   * [[Sampling.capPerGroup]] — no per-domain reducer ever sees more than
   * the cap, so a million-page domain costs the same as a ten-page one.
   */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String, n: Int): DataFrame =
    Sampling.capPerGroup(
      df.withColumn("__domain", registeredDomain(normalize(col(urlCol)))),
      "__domain", idCol, n)
      .withColumnRenamed("__domain", "domain")

  /**
   * Per-domain profile: page count, distinct normalized URLs, and dupe
   * ratio numerators — the report a curation run uses to pick caps and
   * blocklists. Integer-only outputs (oracle-stable).
   */
  def domainProfile(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = df.select(registeredDomain(normalize(col(urlCol))).as("domain"),
      normalize(col(urlCol)).as("url_norm"), col(idCol))
    u.groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("url_norm")).as("n_urls"),
        min(col(idCol)).as("first_id"))
  }

  // -------------------------------------------------- robots-style rules

  /** Path component of a URL ("" if none; query/fragment excluded). */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** A robots.txt-style rule: allow/disallow a path prefix on a host. */
  final case class UrlRule(host: String, pathPrefix: String, allow: Boolean)

  /**
   * Longest-prefix-match URL rule verdict (RFC 9309 §2.2.2 robots.txt
   * semantics — the filter a compliant crawl pipeline applies before
   * fetching, and a curation pipeline re-applies when a site's rules
   * arrive after the crawl): among the rules whose host matches the
   * URL's host and whose path prefix starts the URL's path, the LONGEST
   * prefix wins; at equal length `allow` wins; a URL matching no rule is
   * allowed.
   *
   * Scale shape: the rule table rides the plan as ONE array literal
   * (rule sets are per-host and small), and the verdict is computed
   * SCAN-LOCALLY with codegen'd higher-order functions — filter the rule
   * array per row, take `array_max` over (prefix_length, allow) structs
   * (lexicographic struct ordering implements exactly the
   * longest-then-allow rule). Zero joins, zero shuffles, no UDF.
   */
  def ruleVerdict(url: Column, rules: Seq[UrlRule]): Column = {
    require(rules.nonEmpty, "ruleVerdict needs at least one rule")
    val rulesLit = typedLit(rules.map(r => (r.host, r.pathPrefix, r.allow)))
    val h = host(url)
    val p = path(url)
    val matching = filter(rulesLit, r =>
      r.getField("_1") === h && startswith(p, r.getField("_2")))
    val best = array_max(transform(matching, r =>
      struct(length(r.getField("_2")).as("len"), r.getField("_3").as("allow"))))
    coalesce(best.getField("allow"), lit(true))
  }

  /** Rows of `df` whose URL the rules allow (null URLs kept — no URL, no
    * rule to violate; the NOT-NULL gate is a separate quality filter). */
  def applyRules(df: DataFrame, urlCol: String, rules: Seq[UrlRule]): DataFrame =
    df.where(col(urlCol).isNull || ruleVerdict(col(urlCol), rules))
}
