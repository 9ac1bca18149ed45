package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Exact distribution statistics over bounded-domain integer columns —
 * token counts, char lengths, per-doc gate scores: the corpus-profiling
 * step that picks curation thresholds (e.g. "cut below the p10 token
 * count").
 *
 * Spark's exact `percentile` sorts the whole group in one reducer — a
 * corpus-wide percentile at 100 TB funnels everything through a single
 * task. For bounded domains the scale-safe shape is histogram-first: one
 * map-side-combinable aggregate over the VALUE domain (output rows =
 * #distinct values, independent of corpus size), then quantiles are a
 * cumulative-sum lookup over that tiny histogram — the only window runs
 * over |domain| rows, never over the corpus.
 *
 * The quantile definition is pinned for engine portability: the
 * q-quantile is the smallest value whose cumulative count reaches
 * `ceil(q * n)` (the discrete/lower quantile) — all-integer comparisons,
 * with q expressed in permille so no computed double is ever output.
 */
object Stats {

  /** Value histogram: one row per distinct value with its count.
    * NULL values are excluded (a null has no place on
    * the value axis — SQL percentile/median ignore nulls too; count them
    * separately with `where(valueCol.isNull)` if they need reporting). */
  def histogram(df: DataFrame, valueCol: Column): DataFrame =
    df.where(valueCol.isNotNull)
      .groupBy(valueCol.cast("long").as("value")).agg(count(lit(1)).as("cnt"))

  /** Exact discrete quantiles at the given permille points (500 = median).
    * Returns (q_permille, value). The histogram window is over #distinct
    * values — bounded-domain by contract — so the single-partition sort
    * Spark warns about is a few thousand rows, not the corpus.
    *
    * WARNING — bounded domains ONLY (token counts, sizes in bins, scores
    * quantized to ints). The cumulative window funnels every DISTINCT
    * value through one reducer: pointed at an open domain (latencies in
    * ns, raw doubles, ids) that reducer sees the corpus and this operator
    * becomes the single-node sort everything else here avoids. For open
    * domains use [[QuantileSketch.kllQuantiles]] — mergeable, bounded
    * state, exact below sketch capacity.
    *
    * The bounded-domain contract is now ENFORCED, not just documented:
    * the histogram (itself a distributed aggregate, safe on any domain)
    * is materialized first via localCheckpoint — eager, lineage-severed,
    * auto-cleaned when the frame is GC'd, so no unpersist bookkeeping —
    * and its row count checked against `maxDistinct` BEFORE the
    * single-partition cumulative window ever runs. Pointed at an open
    * domain this now fails loudly with the KLL pointer instead of
    * silently becoming a corpus-wide single-node sort. */
  def exactQuantiles(df: DataFrame, valueCol: Column, permilles: Seq[Int],
                     maxDistinct: Long = 1L << 20): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p > 0 && p <= 1000),
      s"permilles must be in (0, 1000]: $permilles")
    val h = histogram(df, valueCol).localCheckpoint()
    val nd = h.count()
    require(nd <= maxDistinct,
      s"exactQuantiles saw $nd distinct values (> maxDistinct=$maxDistinct): " +
        "this operator is for bounded domains only — the cumulative window " +
        "funnels every distinct value through one reducer. For open domains " +
        "use QuantileSketch.kllQuantiles (mergeable, bounded state).")
    val cumW = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum("cnt").over(cumW))
      .withColumn("n", sum("cnt").over(Window.partitionBy()))
    cum
      .withColumn("q_permille", explode(array(permilles.map(lit): _*)))
      // cum >= ceil(q/1000 * n) in EXACT integer form: the float product
      // rounds up past the true ceiling for hundreds of (q, n) pairs
      // (q=35, n=200: 35/1000.0*200 = 7.000000000000001 → ceil 8, so the
      // value at exact rank 7 was skipped)
      .where(col("cum") * lit(1000L) >= col("q_permille") * col("n"))
      .groupBy("q_permille")
      .agg(min("value").as("value"))
  }

  /** Per-group exact discrete quantiles (per-language/per-source length
    * profiles). Same histogram-first shape with the histogram keyed by
    * (group, value) and the cumulative window partitioned by group — each
    * group's window sees only its own distinct values, so skewed group
    * sizes don't concentrate corpus rows anywhere. NULL values are
    * excluded ([[histogram]] semantics); the same bounded-domain contract
    * as [[exactQuantiles]] is ENFORCED per group: the largest per-group
    * distinct-value count is checked before any group's cumulative window
    * runs (one group with an open domain funnels that whole group through
    * one reducer, exactly what the sibling fails loudly on).
    * Returns (group, q_permille, value). */
  def exactQuantilesBy(df: DataFrame, groupCol: Column, valueCol: Column,
                       permilles: Seq[Int], maxDistinct: Long = 1L << 20): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p > 0 && p <= 1000),
      s"permilles must be in (0, 1000]: $permilles")
    val h = df.where(valueCol.isNotNull)
      .groupBy(groupCol.as("group"), valueCol.cast("long").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val worst = h.groupBy("group").count().agg(max("count")).head()
    val nd = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(nd <= maxDistinct,
      s"exactQuantilesBy saw a group with $nd distinct values (> " +
        s"maxDistinct=$maxDistinct): this operator is for bounded domains " +
        "only — each group's cumulative window funnels its distinct values " +
        "through one reducer. For open domains use " +
        "QuantileSketch.kllQuantiles (mergeable, bounded state).")
    val cumW = Window.partitionBy("group").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum("cnt").over(cumW))
      .withColumn("n", sum("cnt").over(Window.partitionBy("group")))
    cum
      .withColumn("q_permille", explode(array(permilles.map(lit): _*)))
      // exact integer ceiling — see exactQuantiles
      .where(col("cum") * lit(1000L) >= col("q_permille") * col("n"))
      .groupBy("group", "q_permille")
      .agg(min("value").as("value"))
  }

  /** Per-group heavy hitters: the top-k most frequent values of
    * `valueCol` within each group (top tokens per language, top
    * fingerprints per source — the corpus-audit staple). One
    * map-side-combinable count keyed by (group, value), then the
    * bounded-heap top-k ranks (count desc, value asc) — the rank never
    * sees more than k survivors per (group, partition), so a group's
    * value cardinality doesn't size any single sort.
    * Returns (group, rank, value, cnt). */
  def topValuesByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                       k: Int): DataFrame = {
    // null values are excluded (a null is the ABSENCE of a value, not a
    // rankable one — count them with where(valueCol.isNull) if needed);
    // null GROUPS are kept (an unattributed bucket is a real bucket)
    val counts = df.where(valueCol.isNotNull)
      .groupBy(groupCol.as("group"), valueCol.as("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__score", col("cnt").cast("double"))
    Similarity.rankTopKPerQuery(counts, "group", "__score", "value", k)
      .select("group", "rank", "value", "cnt")
  }

  /**
   * The dataset card: corpus-level facts a curated-dataset release
   * documents (Gebru et al., "Datasheets for Datasets") as one long-format
   * (metric, value) frame — row counts, token/char totals, vocabulary-
   * of-attributes cardinalities, the exact-duplicate count, and the
   * median document length. All values are integers (no engine-formatted
   * floats), so the card itself is hashable by an external oracle.
   *
   * Scale shape: one multi-aggregate pass over the corpus (count-distincts
   * included — Spark expands them into one Expand + two-phase aggregate,
   * still map-side combinable), plus the histogram-first median (window
   * over #distinct lengths, not the corpus). No corpus-wide sort, no
   * driver state beyond the card's dozen rows.
   */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
               attrCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (df.isEmpty) return Seq("n_docs" -> 0L).toDF("metric", "value")
    val tokens = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      countDistinct(col(idCol)).as("n_distinct_ids"),
      countDistinct(col(textCol)).as("n_distinct_texts"),
      // duplicates compare against NON-NULL texts: countDistinct ignores
      // nulls, so n_docs - n_distinct_texts would report every null-text
      // doc as a "duplicate" of nothing
      count(col(textCol)).as("n_nonnull_texts"),
      sum(tokens).as("total_tokens"),
      sum(length(col(textCol)).cast("long")).as("total_chars"),
      min(tokens).as("min_doc_tokens"),
      max(tokens).as("max_doc_tokens")) ++
      attrCols.map(c => countDistinct(col(c)).as(s"n_distinct_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // sum/min/max over an all-null column are null, and the null-excluding
    // histogram can be empty — a degenerate corpus must produce a card,
    // not an NPE; 0 is the honest integer for "no measurable text"
    def longAt(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    val medianRows = exactQuantiles(df, tokens, Seq(500)).collect()
    val median = if (medianRows.isEmpty) 0L else medianRows.head.getLong(1)
    val base = Seq(
      "n_docs" -> row.getLong(0),
      "n_distinct_ids" -> row.getLong(1),
      "n_distinct_texts" -> row.getLong(2),
      "n_exact_dup_docs" -> (row.getLong(3) - row.getLong(2)),
      "total_tokens" -> longAt(4),
      "total_chars" -> longAt(5),
      "min_doc_tokens" -> longAt(6),
      "max_doc_tokens" -> longAt(7),
      "median_doc_tokens" -> median) ++
      attrCols.zipWithIndex.map { case (c, i) =>
        s"n_distinct_$c" -> row.getLong(8 + i)
      }
    base.toDF("metric", "value")
  }

  /**
   * Token-distribution drift between two corpora: the k word n-grams whose
   * relative frequency moved most between snapshot A and snapshot B — the
   * corpus-shift report a recurring crawl monitors (topic drift, spam
   * bursts, a source going dark). The drift score is the cross-multiplied
   * integer |cnt_a * total_b − cnt_b * total_a| (the unnormalized
   * |p_a − p_b| with the division cleared), carried as DECIMAL(38,0) so
   * products of two corpus-scale longs cannot overflow and an external
   * oracle reproduces the ordering bit-exactly.
   *
   * Output: (rank, gram, cnt_a, cnt_b) — score desc, ties gram asc.
   *
   * Scale shape: per-side gram counts are one hash-keyed aggregate each
   * (gram strings bounded by the n-gram vocabulary, not the corpus); the
   * full outer join is gram-keyed; top-k is a TakeOrdered (per-partition
   * heads, never a global sort).
   */
  def gramDrift(dfA: DataFrame, dfB: DataFrame, textCol: String,
                n: Int = 1, k: Int = 20): DataFrame = {
    // each side's gram table feeds two consumers (its total and the join);
    // persist so the explode+aggregate runs once per side, and the totals
    // land in the same cached partitions
    def counts(df: DataFrame) =
      df.select(explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached, see Dedup band table
    val a = counts(dfA)
    val b = counts(dfB)
    // sum over an empty side is null — an empty first snapshot (a drift
    // monitor's first run) must produce a report, not an NPE
    def total(df: DataFrame): Long = {
      val v = df.agg(sum("cnt")).head()
      if (v.isNullAt(0)) 0L else v.getLong(0)
    }
    val totA = total(a)
    val totB = total(b)
    val joined = a.withColumnRenamed("cnt", "cnt_a")
      .join(b.withColumnRenamed("cnt", "cnt_b"), Seq("gram"), "full_outer")
      .select(col("gram"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .withColumn("drift",
        abs(col("cnt_a").cast(DecimalType(38, 0)) * totB -
            col("cnt_b").cast(DecimalType(38, 0)) * totA))
    joined.orderBy(col("drift").desc, col("gram").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("drift").desc, col("gram").asc)))
      .select("rank", "gram", "cnt_a", "cnt_b")
  }
}
