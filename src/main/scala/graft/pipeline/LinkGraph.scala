package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph authority scoring — the web-corpus curation prior that ranks
 * a page by who links to it rather than what it says (CommonCrawl-style
 * pipelines gate on harmonic centrality / PageRank of the host graph; a
 * spam farm has great n-grams but no inbound authority).
 *
 * Three stages, each independently reusable:
 *
 *   1. [[extractHrefs]] — pull `href="..."` targets out of raw HTML with a
 *      scan-local regexp (no parser, no UDF; the corpus never leaves the
 *      projection).
 *   2. [[domainEdges]] — collapse page→page links to the registered-domain
 *      graph (src domain from the page's own URL, dst from each normalized
 *      href), self-loops dropped, duplicate edges collapsed. The domain
 *      graph is orders of magnitude smaller than the page graph, which is
 *      what makes authority joins broadcast-able downstream.
 *   3. [[pageRankInt]] / [[pageRank]] — power iteration. The integer path
 *      propagates discrete "mass" with floor division, so every engine
 *      computes bit-identical results (the DuckDB oracle replays it
 *      exactly); the double path is the production variant with real
 *      damping arithmetic. Both share one shape: per iteration, one join
 *      of ranks to the (persisted) degree-annotated edge list keyed by
 *      src, one aggregate keyed by dst. Nothing corpus-sized ever reaches
 *      the driver.
 *
 * Scale shape at 100 TB: href extraction and domain mapping are
 * scan-local. The edge list persists once (degree pre-joined), so each of
 * the k iterations costs exactly two shuffles — ranks→src join, contrib→
 * dst aggregate — on the DOMAIN graph (≈10⁷ nodes for the full web, far
 * smaller than the corpus). For page-level graphs, pre-bucketing edges by
 * src removes the join shuffle; the aggregate shuffle is the PageRank
 * floor. Dangling mass evaporates (the standard simplification — adding
 * the uniform redistribution term is one extra scalar aggregate per
 * iteration and does not change the plan shape).
 *
 * Reference scope note: the reference system (EmoDB) has no graph
 * operator — this is part of the training-data-pipeline surface, like
 * dedup and DSIR. Method: Page et al., "The PageRank Citation Ranking"
 * (1999), power-iteration formulation.
 */
object LinkGraph {

  /** All href targets in an HTML string, in document order. Double-quoted
    * attributes only (the deterministic-corpus contract; single-quoted
    * hrefs are a data-cleaning concern upstream). */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))

  /**
   * Distinct registered-domain edges from pages: `srcUrlCol` is the page's
   * own URL, `htmlCol` its markup. Hrefs are URL-normalized before domain
   * extraction so `HTTPS://WWW.X.org/` and `https://x.org` collapse to one
   * target. Self-loops (intra-domain navigation) are dropped — they carry
   * no authority signal and at web scale are the bulk of raw links.
   */
  def domainEdges(pages: DataFrame, srcUrlCol: String, htmlCol: String): DataFrame =
    pages.select(
        Urls.registeredDomainFast(col(srcUrlCol)).as("src"),
        explode(extractHrefs(col(htmlCol))).as("href"))
      .select(col("src"), Urls.registeredDomainFast(col("href")).as("dst"))
      .where(col("src") =!= col("dst") && col("src") =!= "" && col("dst") =!= "")
      .distinct()

  /**
   * Integer-exact PageRank: every node starts with `seedMass`; each
   * iteration a node keeps `seedMass * (dampDen-dampNum) / dampDen` as its
   * base and receives `floor(dampNum * mass / (dampDen * outDegree))` from
   * each in-neighbor. All arithmetic is integral (floor division), so the
   * result is bit-identical across engines and partitionings — this is the
   * oracle-gated audit path, same pattern as DSIR's integer votes.
   *
   * `seedMass * (dampDen - dampNum)` must be divisible by `dampDen` (it is
   * for the 85/100 default) — asserted, not silently floored.
   *
   * Output: (node, mass) for every node that appears as a src or dst.
   */
  def pageRankInt(edges: DataFrame, iters: Int, dampNum: Long = 85L,
                  dampDen: Long = 100L, seedMass: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seedMass * (dampDen - dampNum) % dampDen == 0,
      s"dampDen must divide seedMass*(dampDen-dampNum) ($seedMass, $dampNum/$dampDen)")
    val base = seedMass * (dampDen - dampNum) / dampDen
    val e = edges.select(col("src"), col("dst"))
    // degree-annotated edges persist once; every iteration reuses them
    val deg = e.groupBy("src").agg(count(lit(1)).as("outd"))
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var mass = nodes.withColumn("mass", lit(seedMass))
    for (_ <- 1 to iters) {
      val contrib = ed.join(mass.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"($dampNum * mass) div ($dampDen * outd)").as("c"))
        .groupBy("node").agg(sum("c").as("inmass"))
      mass = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inmass"), lit(0L))).as("mass"))
    }
    // materialize the result, then release the loop-only caches — the
    // caller gets a persisted frame (theirs to unpersist) and no hidden
    // session state accumulates across calls
    val out = mass.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    ed.unpersist(false)
    nodes.unpersist(false)
    out
  }

  /**
   * Production PageRank (double damping arithmetic, rank normalized to sum
   * ≈ node count). Same two-shuffles-per-iteration shape as
   * [[pageRankInt]]; each iteration's ranks persist and the previous
   * iteration unpersists once superseded, so lineage stays O(1) deep over
   * long runs instead of compounding k join trees.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outd"))
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var mass = nodes.withColumn("rank", lit(1.0))
    var prev: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contrib = ed.join(mass.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (lit(damping) * col("rank") / col("outd")).as("c"))
        .groupBy("node").agg(sum("c").as("inr"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + coalesce(col("inr"), lit(0.0))).as("rank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize (final iteration included) before dropping prev
      prev.foreach(_.unpersist(false))
      prev = Some(next)
      mass = next
    }
    ed.unpersist(false)
    nodes.unpersist(false)
    mass // persisted + materialized; the caller's to unpersist
  }

  /** Whole anchor tags (`<a href="...">text</a>`, double-quoted href,
    * text without nested markup) — the unit [[anchorTerms]] decomposes.
    * regexp_extract_all returns one group per call, so tags extract whole
    * and href/text split per tag with two scan-local regexp_extracts. */
  private[pipeline] val AnchorTagRe = "<a href=\"[^\"]*\"[^>]*>[^<]*</a>"

  /**
   * Inbound anchor-text profile: the top `topK` terms other domains use
   * when linking to each target domain — the classic query-independent
   * relevance/topic signal (what the web CALLS a site, vs what the site
   * says about itself). Self-links are excluded: a site's own navigation
   * text is self-description, not reputation.
   *
   * Output: (domain, rank, term, cnt), rank 1 = most frequent, ties by
   * term asc. Scale shape: tag explode and href/anchor split are
   * scan-local; the only shuffle is the (domain, term) count aggregate
   * (map-side combinable); top-k per domain rides the bounded-heap rank,
   * so no domain's full term distribution ever sorts in one reducer.
   */
  def anchorTerms(pages: DataFrame, srcUrlCol: String, htmlCol: String,
                  topK: Int = 20): DataFrame = {
    val tags = pages.select(
      Urls.registeredDomainFast(col(srcUrlCol)).as("src"),
      explode(regexp_extract_all(col(htmlCol), lit(AnchorTagRe), lit(0))).as("tag"))
    val pairs = tags.select(col("src"),
      Urls.registeredDomainFast(
        regexp_extract(col("tag"), "<a href=\"([^\"]+)\"", 1)).as("domain"),
      regexp_extract(col("tag"), ">([^<]*)</a>", 1).as("anchor"))
      .where(col("src") =!= col("domain") && col("domain") =!= "")
    val terms = pairs.select(col("domain"),
        explode(split(lower(trim(col("anchor"))), "\\s+")).as("term"))
      .where(col("term") =!= "")
    Stats.topValuesByGroup(terms, col("domain"), col("term"), topK)
      .withColumnRenamed("group", "domain")
      .withColumnRenamed("value", "term")
  }

  /**
   * Per-document authority prior: each page joined to its domain's rank.
   * The rank table is domain-sized (broadcast-able by construction — that
   * was the point of collapsing to domains), so this is a broadcast hash
   * join with no corpus shuffle.
   */
  def authorityJoin(pages: DataFrame, urlCol: String, ranks: DataFrame): DataFrame =
    pages
      .withColumn("domain", Urls.registeredDomainFast(col(urlCol)))
      .join(broadcast(ranks.withColumnRenamed("node", "domain")), Seq("domain"), "left")
}
