package graft.spark

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components cluster assignment over near-dup pairs: multi-hop
  * chains, star shapes, disjoint components, canonical representatives,
  * and the non-paired-rows passthrough of dropNearDuplicates. */
class DedupClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairs(ps: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    ps.toDF("id1", "id2")
  }

  private def clusters(df: DataFrame): Map[Long, Long] =
    Dedup.duplicateClusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // force the distributed star-contraction path (fast path disabled)
  private def clustersIterative(df: DataFrame): Map[Long, Long] =
    Dedup.duplicateClusters(df, collectThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def clustersBy(df: DataFrame, method: String, iters: Int = 20): Map[Long, Long] =
    Dedup.duplicateClusters(df, maxIters = iters, collectThreshold = 0, method = method)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain needs multi-hop propagation to one component") {
    // 5-4-3-2-1: label 1 must travel 4 hops
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    assert(clusters(pairs((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))) === expect)
    assert(clustersIterative(pairs((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))) === expect)
  }

  test("star and disjoint components keep separate labels") {
    val got = clusters(pairs((10L, 11L), (10L, 12L), (10L, 13L), // star at 10
      (20L, 21L), (21L, 22L),                                    // chain
      (30L, 31L)))                                               // pair
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("bridging edge merges two cliques") {
    val got = clusters(pairs((1L, 2L), (2L, 3L), (1L, 3L),  // clique A
      (7L, 8L), (8L, 9L), (7L, 9L),                          // clique B
      (3L, 7L)))                                             // bridge
    assert(got.values.toSet === Set(1L))
  }

  test("maxIters caps the rounds (partial labels, no hang)") {
    val chain = pairs((4L, 3L), (3L, 2L), (2L, 1L))
    val partial = Dedup.duplicateClusters(chain, maxIters = 1, collectThreshold = 0,
        method = "propagate")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after one propagation round, 4 has only seen 3's initial label
    assert(partial(4L) === 3L && partial(1L) === 1L)
  }

  test("star contraction solves a high-diameter chain in O(log d) rounds") {
    // a 256-link chain: diameter 255. Star contraction converges within 12
    // alternating rounds; min-label propagation capped at the same 12
    // rounds is still far from done — the reason the high-diameter tier
    // exists (Kiveris et al., Alg. 3).
    val chain = pairs((1L to 255L).map(i => (i, i + 1)): _*)
    val expect = (1L to 256L).map(_ -> 1L).toMap
    assert(clustersBy(chain, "star", iters = 12) === expect)
    val partial = clustersBy(chain, "propagate", iters = 12)
    assert(partial !== expect, "propagation should not finish a 255-hop chain in 12 rounds")
    // and with enough rounds propagation agrees (differential on the same graph)
    assert(clustersBy(chain, "propagate", iters = 300) === expect)
  }

  test("randomized differential: propagation equals union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30
      val es = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = es.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component min = min over all members with the same root
          val root = find(v.toInt)
          (0 until n).filter(u => find(u) == root)
            .filter(u => es.exists(e => e._1 == u || e._2 == u)).min.toLong
        }).toMap
      // all tiers must agree with the driver oracle
      assert(clustersIterative(pairs(es: _*)) === expected, s"edges (star): $es")
      assert(clustersBy(pairs(es: _*), "propagate") === expected, s"edges (propagate): $es")
      assert(clusters(pairs(es: _*)) === expected, s"edges (fast path): $es")
    }
  }

  test("dropNearDuplicates keeps canonical members and unpaired rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "a copy"), (3L, "a copy2"), (9L, "unique"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, pairs((1L, 2L), (2L, 3L)), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 9L))
  }

  test("pairAgreement normalizes orientation and flags each side's exclusives") {
    val s = spark
    import s.implicits._
    // (2,1) reversed + a duplicate row: normalization must collapse both
    val a = Seq((2L, 1L), (1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val b = Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val got = Dedup.pairAgreement(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet
    assert(got === Set(
      (1L, 2L, true, true),   // agreed (after normalizing b's orientation? both 1<2)
      (3L, 4L, true, false),  // method A only
      (5L, 6L, false, true))) // method B only
  }

  test("agreementSummary rolls the report up to integer both/a-only/b-only counts") {
    val s = spark
    import s.implicits._
    val a = Seq((2L, 1L), (1L, 2L), (3L, 4L), (7L, 8L)).toDF("id1", "id2")
    val b = Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val got = Dedup.agreementSummary(Dedup.pairAgreement(a, b)).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((1L, 2L, 1L)))
    // empty report: zero counts, not nulls (sum-over-empty would be null
    // without the when/otherwise formulation feeding real zeros per row)
    val empty = Dedup.agreementSummary(
      Dedup.pairAgreement(a.limit(0), b.limit(0))).collect()(0)
    assert(!empty.isNullAt(0) && empty.getLong(0) === 0L
      && empty.getLong(1) === 0L && empty.getLong(2) === 0L)
  }

  test("thresholdSensitivity counts pairs at each threshold in one pass; " +
      "null scores never qualify") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, 2L, Some(1.0)), (1L, 3L, Some(0.8)), (2L, 3L, Some(0.5)),
      (4L, 5L, Some(0.09)), (6L, 7L, None)).toDF("id1", "id2", "jaccard")
    val got = Dedup.thresholdSensitivity(pairs, Seq(0.1, 0.5, 0.8, 0.995))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // 0.09 sits BELOW the lowest threshold and the null row never counts
    assert(got === Map(0.1 -> 3L, 0.5 -> 3L, 0.8 -> 2L, 0.995 -> 1L))
    assertThrows[IllegalArgumentException](
      Dedup.thresholdSensitivity(pairs, Seq.empty))
    // zeros-not-nulls on an EMPTY pair list (ADVICE r10): sum over an
    // empty frame is null unless coalesced, like agreementSummary
    val onEmpty = Dedup.thresholdSensitivity(pairs.limit(0), Seq(0.1, 0.5))
      .collect().map(r => (r.getDouble(0), r.isNullAt(1), r.getLong(1)))
    assert(onEmpty.toSeq === Seq((0.1, false, 0L), (0.5, false, 0L)))
  }

  test("FUZZ: both audit rollups match brute-force references on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 8) {
      // random pair lists with duplicates and reversed orientations
      def pairList(n: Int): Seq[(Long, Long)] = Seq.fill(n) {
        val a = rnd.nextInt(12).toLong; var b = rnd.nextInt(12).toLong
        if (a == b) b = a + 1
        if (rnd.nextBoolean()) (a, b) else (b, a)
      }
      val aPairs = pairList(1 + rnd.nextInt(20))
      val bPairs = pairList(1 + rnd.nextInt(20))
      val aNorm = aPairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val bNorm = bPairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val expect = (
        (aNorm & bNorm).size.toLong,
        (aNorm -- bNorm).size.toLong,
        (bNorm -- aNorm).size.toLong)
      val got = Dedup.agreementSummary(Dedup.pairAgreement(
          aPairs.toDF("id1", "id2"), bPairs.toDF("id1", "id2"))).collect()(0)
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) === expect,
        s"round $round: a=$aPairs b=$bPairs")

      // random scored pairs (incl. nulls and exact-boundary scores) vs a
      // direct filter count at every threshold
      val scored = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextLong(), rnd.nextLong(),
          if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(21) * 0.05))) // lands ON thresholds often
      val thresholds = Seq(0.0, 0.25, 0.5, 0.75, 0.95)
      val sweep = Dedup.thresholdSensitivity(
          scored.toDF("id1", "id2", "jaccard"), thresholds)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      for (t <- thresholds) {
        val brute = scored.count(_._3.exists(_ >= t)).toLong
        assert(sweep(t) === brute, s"round $round t=$t: $scored")
      }
    }
  }
}
