package graft.spark

import graft.pipeline.{Sampling, Stats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Histogram-first exact discrete quantiles: differential vs a naive
  * sorted-rank reference on random data, plus the bounded-domain plan
  * contract (corpus rows aggregate before any window). */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def naive(values: Seq[Long], permilles: Seq[Int]): Map[Int, Long] = {
    val sorted = values.sorted
    val n = sorted.size
    permilles.map { p =>
      // exact integer ceil(p/1000 * n) — the float product rounds up past
      // the true ceiling for many (p, n) pairs (p=35, n=200 → 7.0000…01 →
      // ceil 8), which is the defect the operator itself had
      val target = ((p.toLong * n + 999L) / 1000L).toInt
      p -> sorted(math.max(target, 1) - 1) // smallest value with rank >= target
    }.toMap
  }

  test("exactQuantiles matches the sorted-rank reference (randomized)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val values = Seq.fill(500 + trial * 300)(rnd.nextInt(60).toLong + 1)
      val df = values.toDF("v")
      val permilles = Seq(1, 100, 250, 500, 750, 900, 990, 1000)
      val got = Stats.exactQuantiles(df, col("v"), permilles)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got === naive(values, permilles), s"trial $trial")
    }
  }

  test("exactQuantiles fails loudly on an open domain (bounded-domain guard)") {
    val s = spark
    import s.implicits._
    val open = (1L to 500L).toDF("v") // 500 distinct values
    val e = intercept[IllegalArgumentException] {
      Stats.exactQuantiles(open, col("v"), Seq(500), maxDistinct = 100)
    }
    assert(e.getMessage.contains("kllQuantiles"),
      "the guard must point at the open-domain route")
    // the same data under a sufficient cap still answers exactly
    assert(Stats.exactQuantiles(open, col("v"), Seq(1000), maxDistinct = 1000)
      .head().getLong(1) === 500L)
  }

  test("quantile rank threshold is exact integer math (q=35, n=200 was " +
       "off by one under the float formulation)") {
    val s = spark
    import s.implicits._
    // 35/1000.0*200 = 7.000000000000001 → float ceil 8 skips the value at
    // exact rank 7; the true p3.5 of 1..200 is 7
    val df = (1L to 200L).toDF("v")
    assert(Stats.exactQuantiles(df, col("v"), Seq(35)).head().getLong(1) === 7L)
    assert(Stats.exactQuantilesBy(df.withColumn("g", lit("a")), col("g"),
      col("v"), Seq(35)).head().getLong(2) === 7L)
    // KLL exact regime shares the rank rule
    val kll = df.select(graft.pipeline.QuantileSketch.quantiles(col("v"), Seq(35)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(kll.head.getLong(1) === 7L)
  }

  test("null values are excluded from quantiles (SQL percentile semantics)") {
    val s = spark
    import s.implicits._
    // 1..100 plus 80 nulls: a null bucket would sort FIRST in the window
    // and inflate n, dragging the median from 50 to 10
    val df = ((1L to 100L).map(v => Some(v)) ++ Seq.fill(80)(Option.empty[Long]))
      .toDF("v")
    assert(Stats.exactQuantiles(df, col("v"), Seq(500)).head().getLong(1) === 50L)
    val byGroup = Stats.exactQuantilesBy(df.withColumn("g", lit("x")), col("g"),
      col("v"), Seq(500))
    assert(byGroup.head().getLong(2) === 50L)
  }

  test("exactQuantilesBy fails loudly on an open domain (per-group " +
       "bounded-domain guard, parity with the ungrouped sibling)") {
    val s = spark
    import s.implicits._
    val open = (1L to 5000L).map(v => ("g", v)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.exactQuantilesBy(open, col("g"), col("v"), Seq(500), maxDistinct = 1000)
    }
    assert(e.getMessage.contains("kllQuantiles"))
  }

  test("median of skewed and constant data") {
    val s = spark
    import s.implicits._
    val skew = (Seq.fill(99)(1L) ++ Seq(1000L)).toDF("v")
    assert(Stats.exactQuantiles(skew, col("v"), Seq(500)).head().getLong(1) === 1L)
    assert(Stats.exactQuantiles(skew, col("v"), Seq(1000)).head().getLong(1) === 1000L)
    val const = Seq.fill(10)(7L).toDF("v")
    assert(Stats.exactQuantiles(const, col("v"), Seq(1, 500, 1000))
      .collect().map(_.getLong(1)).toSet === Set(7L))
  }

  test("exactQuantilesBy matches per-group naive reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(800)((s"g${rnd.nextInt(4)}", rnd.nextInt(40).toLong + 1))
    val df = rows.toDF("g", "v")
    val permilles = Seq(250, 500, 990)
    val got = Stats.exactQuantilesBy(df, col("g"), col("v"), permilles)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      naive(rs.map(_._2), permilles).map { case (p, v) => (g, p) -> v }
    }
    assert(got === expected)
  }

  test("topValuesByGroup: per-group frequency top-k with pinned tie-break") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"), ("g1", "c"),
      ("g2", "z"), ("g2", "y"), ("g2", "z"), ("g2", "x"), ("g2", "y"))
    val got = Stats.topValuesByGroup(rows.toDF("g", "v"), col("g"), col("v"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // g2: y and z both count 2 -> value asc tie-break puts y first
    assert(got === Seq(("g1", 1, "a", 3L), ("g1", 2, "b", 2L),
      ("g2", 1, "y", 2L), ("g2", 2, "z", 2L)))
  }

  test("capPerGroup: at most n per group, deterministic md5 order, rerun-stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val cap = 5
    val got = Sampling.capPerGroup(df, "g", "id", cap)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0)))
    assert(got.groupBy(_._1).forall(_._2.size == cap))
    // naive reference: sort each group by (md5-uniform, id), take cap
    def u(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val expected = (0L until 200L).groupBy(i => s"g${i % 3}").flatMap { case (g, ids) =>
      ids.sortBy(i => (u(i), i)).take(cap).zipWithIndex.map { case (i, r) => (g, r + 1, i) }
    }.toSet
    assert(got.toSet === expected)
    // rerun-stable
    val again = Sampling.capPerGroup(df.repartition(13), "g", "id", cap)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    assert(again === expected)
  }

  test("plan contract: corpus aggregates into a histogram before any window") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(_.toLong % 20).toDF("v")
    val plan = Stats.exactQuantiles(df, col("v"), Seq(500))
      .queryExecution.executedPlan.toString
    // the window's input must be the HISTOGRAM, never corpus rows: since
    // the bounded-domain guard materializes the histogram (localCheckpoint,
    // so its distinct-value count is checked BEFORE the single-partition
    // window runs), the plan below the Window is the checkpointed RDD scan
    // — the aggregate already ran eagerly. Either shape (inline aggregate
    // or materialized scan) satisfies the contract; a corpus file scan
    // below the window would violate it.
    val windowIdx = plan.indexOf("Window")
    val histIdx = math.max(plan.lastIndexOf("HashAggregate"),
      plan.lastIndexOf("ExistingRDD"))
    assert(windowIdx >= 0 && histIdx > windowIdx,
      s"expected the histogram (aggregate or checkpointed scan) beneath the window:\n$plan")
    assert(!plan.substring(windowIdx).contains("FileScan"),
      s"corpus file scan must never feed the window directly:\n$plan")
  }

  test("gramDrift ranks by cross-multiplied integer drift, matches naive reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("u", "v", "w", "x", "y")
    def mk(n: Int, skewTo: String) = (0 until n).map { i =>
      (i.toLong, Seq.fill(5)(if (rnd.nextInt(3) == 0) skewTo
        else vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val aRows = mk(40, "u"); val bRows = mk(40, "y")
    def docFreq(rows: Seq[(Long, String)]) = rows
      .flatMap { case (_, t) => t.split(" ").distinct }
      .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val (fa, fb) = (docFreq(aRows), docFreq(bRows))
    val (ta, tb) = (fa.values.sum, fb.values.sum)
    val expected = (fa.keySet ++ fb.keySet).toSeq
      .map { g =>
        val (ca, cb) = (fa.getOrElse(g, 0L), fb.getOrElse(g, 0L))
        (g, ca, cb, (BigInt(ca) * tb - BigInt(cb) * ta).abs)
      }
      .sortBy { case (g, _, _, d) => (-d, g) }.take(3)
      .zipWithIndex.map { case ((g, ca, cb, _), i) => (i + 1, g, ca, cb) }
    val got = Stats.gramDrift(aRows.toDF("id", "text"), bRows.toDF("id", "text"),
        "text", n = 1, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("gramDrift: an empty snapshot yields a report, not an NPE") {
    val s = spark
    import s.implicits._
    val a = Seq.empty[(Long, String)].toDF("id", "text")
    val b = Seq((1L, "only side with data")).toDF("id", "text")
    val got = Stats.gramDrift(a, b, "text", n = 1, k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // drift = |0*tot_b - cnt_b*0| = 0 for every gram: rank by gram asc
    assert(got.toSeq === Seq((1, "data", 0L, 1L), (2, "only", 0L, 1L)))
  }

  test("dataCard reports corpus release facts as exact integers") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "one two three", "en", "web"),
      (2L, "one two three", "en", "web"),     // exact dup text
      (3L, "four five six seven eight", "de", "code"),
      (4L, "nine", "en", "web"))
      .toDF("id", "text", "lang", "source")
    val card = Stats.dataCard(df, "id", "text", attrCols = Seq("lang", "source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") === 4L)
    assert(card("n_distinct_ids") === 4L)
    assert(card("n_distinct_texts") === 3L)
    assert(card("n_exact_dup_docs") === 1L)
    assert(card("total_tokens") === 3L + 3L + 5L + 1L)
    assert(card("total_chars") === 13L + 13L + 25L + 4L)
    assert(card("min_doc_tokens") === 1L)
    assert(card("max_doc_tokens") === 5L)
    assert(card("median_doc_tokens") === 3L) // ranks: 1,3,3,5 -> ceil(2)=2nd
    assert(card("n_distinct_lang") === 2L)
    assert(card("n_distinct_source") === 2L)
    // empty corpus degenerates to the single n_docs row
    val empty = Stats.dataCard(Seq.empty[(Long, String)].toDF("id", "text"), "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty === Map("n_docs" -> 0L))
  }

  test("dataCard: null texts are not duplicates, and an all-null corpus " +
       "yields a card instead of an NPE") {
    val s = spark
    import s.implicits._
    // 3 unique texts + 2 null texts: countDistinct ignores nulls, so the
    // old n_docs - n_distinct formula reported the nulls as 2 duplicates
    val df = Seq((1L, Some("aa bb")), (2L, Some("cc dd")), (3L, Some("ee ff")),
      (4L, Option.empty[String]), (5L, Option.empty[String])).toDF("id", "text")
    val card = Stats.dataCard(df, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") === 5L)
    assert(card("n_exact_dup_docs") === 0L)
    assert(card("median_doc_tokens") === 2L) // over the 3 measurable docs
    // degenerate: every text null — sum/min/max aggregates are null and
    // the null-excluding histogram is empty; the card must still build
    val allNull = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val c2 = Stats.dataCard(allNull, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("n_docs") === 2L)
    assert(c2("n_exact_dup_docs") === 0L)
    assert(c2("total_tokens") === 0L && c2("median_doc_tokens") === 0L)
  }

  test("topValuesByGroup: null values are excluded, null groups kept") {
    val s = spark
    import s.implicits._
    val df = Seq((Some("g1"), Some("a")), (Some("g1"), Some("a")),
      (Some("g1"), Option.empty[String]),      // null value: not rankable
      (Option.empty[String], Some("z")))       // null group: real bucket
      .toDF("g", "v")
    val got = Stats.topValuesByGroup(df, col("g"), col("v"), k = 2)
      .collect().map(r => (Option(r.getString(0)), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === Set((Some("g1"), "a", 2L), (None, "z", 1L)))
  }
}
