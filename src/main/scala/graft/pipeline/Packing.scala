package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Sequence packing for LLM pretraining: concatenate documents in a stable
 * global order and cut the token stream every `budget` tokens
 * ("concat-then-chunk", the packing GPT-style training loaders apply). A
 * document is assigned to the chunk containing its FIRST token, so the
 * assignment is a pure function of the global token prefix sum.
 *
 * The prefix sum is a distributed two-phase scan: range-partition by the
 * order key, per-partition token totals (ONE collect of numPartitions
 * longs), then a per-partition running sum seeded with the exclusive
 * partition offset. A plain `Window.orderBy(id)` cumsum would funnel the
 * whole table through one reducer — the classic prefix-sum scale trap this
 * module exists to avoid. The per-partition pass is genuine imperative
 * per-partition logic, the one place the RDD escape hatch is the right
 * tool.
 */
object Packing {

  /** Adds `start_offset`: the exclusive global prefix sum of `tokensCol`
    * in `idCol` order — or in `(orderCol, idCol)` order when an explicit
    * order column is given (e.g. a hash for shuffled-order carving).
    * `carry` names extra (narrow!) columns to ride through the scan — they
    * land in the output unchanged, saving the caller a corpus-wide rejoin;
    * wide columns (text) should re-join by id instead.
    * Output: idCol, tokensCol (long) [, orderCol] [, carry...], start_offset. */
  def withStartOffsets(df: DataFrame, idCol: String, tokensCol: String,
                       numPartitions: Int = 0,
                       orderCol: Option[String] = None,
                       carry: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sortKeys = orderCol.map(c => Seq(col(c), col(idCol)))
      .getOrElse(Seq(col(idCol)))
    // persist AFTER the range exchange + sort: both scan phases must see
    // byte-identical partitions (range boundaries come from sampling, so
    // re-execution is not guaranteed to reproduce them). Session-cached on
    // purpose — the SQL cache dedupes by logical plan, so repeated packing
    // calls over one corpus share the sorted scan (see the Dedup band
    // table for the policy; a GC-cleaned localCheckpoint re-measured
    // ~1.5x slower on every packing row because each call recomputes the
    // range exchange the cache shares).
    val parted = df.select(
        Seq(col(idCol), coalesce(col(tokensCol).cast("long"), lit(0L)).as(tokensCol)) ++
          orderCol.map(col) ++ carry.map(col) : _*)
      .repartitionByRange(p, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-partition totals — numPartitions rows to the driver
    val totals = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator((pid, s))
    }.collect().toMap
    val offsets = (0 until p).scanLeft(0L) { (acc, pid) =>
      acc + totals.getOrElse(pid, 0L)
    }.toArray
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // phase 2: running sum per partition seeded with the exclusive offset
    val outSchema = StructType(
      parted.schema.fields :+ StructField("start_offset", LongType, nullable = false))
    val rows = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bOffsets.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(1)
        out
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Chunk assignment: adds `seq_id` = floor(start_offset / budget). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    withStartOffsets(df, idCol, tokensCol, numPartitions)
      .withColumn("seq_id", floor(col("start_offset") / budget))
  }

  /** Per-sequence packing stats: (seq_id, n_docs, n_tokens). n_tokens can
    * exceed `budget` only via the one document straddling the chunk edge. */
  def sequenceStats(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame =
    packSequences(df, idCol, tokensCol, budget, numPartitions)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))

  /**
   * Length-bucketed bin packing for the PADDING regime (SFT / seq2seq
   * batches, where documents are never split or concatenated across
   * examples): round each doc's length up to a `bandWidth` multiple, treat
   * every doc in a band as costing the band (that is the padding), and
   * fill bins of `budget` tokens arithmetically — `perBin = budget div
   * band` docs per bin, bin = per-band rank div perBin. Unlike greedy
   * first-fit (inherently sequential), the assignment is a pure function
   * of the per-band rank, so it distributes, reruns stably (md5 order) and
   * is engine-exact for the oracle. Padding waste per doc is < bandWidth
   * plus the final partial bin per band. Docs longer than `budget` get a
   * bin of their own (`perBin` clamps to 1 — truncation is the loader's
   * policy, not the packer's).
   *
   * Scale shape: one global prefix-rank pass ordered by (band, md5) — the
   * same two-phase scan as [[withStartOffsets]], never a per-band window —
   * plus a band-count aggregate (bands are bounded by maxLen/bandWidth,
   * collected like any parameter-sized state).
   *
   * Output: idCol, tokensCol, band, bin (global bin id unique across
   * bands), slot (position within the bin).
   */
  def lengthBucketedPack(df: DataFrame, idCol: String, tokensCol: String,
                         budget: Long, bandWidth: Long,
                         numPartitions: Int = 0): DataFrame = {
    require(budget > 0 && bandWidth > 0 && bandWidth <= budget,
      s"need 0 < bandWidth <= budget (got $bandWidth, $budget)")
    val spark = df.sparkSession
    val banded = df.select(col(idCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as(tokensCol))
      .withColumn("band",
        greatest(lit(bandWidth), expr(s"(($tokensCol + ${bandWidth - 1}) div $bandWidth) * $bandWidth")))
      // fixed-width band prefix + md5 = one lexicographic order key
      .withColumn("__order",
        concat(lpad(col("band").cast("string"), 19, "0"),
          md5(col(idCol).cast("string"))))
      .withColumn("__one", lit(1L))
    // band and token count ride through the prefix-rank scan (narrow longs),
    // so no corpus rejoin is needed and everything downstream — including
    // the band-count collect — derives from the ONE persisted sorted scan
    // inside withStartOffsets (rerun-stable by construction)
    val ranked = withStartOffsets(banded, idCol, "__one", numPartitions,
        orderCol = Some("__order"), carry = Seq("band", tokensCol))
      .withColumnRenamed("start_offset", "__grank")
    // per-band exclusive start rank: docs in lexicographically earlier
    // bands (bands are few — parameter-sized driver state)
    val bandCounts = ranked.groupBy("band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bandStarts = bandCounts.map(_._1)
      .zip(bandCounts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val startExpr = bandStarts.foldLeft(lit(0L)) { case (acc, (b, s)) =>
      when(col("band") === b, lit(s)).otherwise(acc) }
    ranked
      .withColumn("__brank", col("__grank") - startExpr)
      .withColumn("__per_bin", greatest(lit(1L), expr(s"$budget div band")))
      .withColumn("__band_bin", expr("__brank div __per_bin"))
      // global bin id: band start rank is a valid disambiguator because
      // bins never hold more docs than the band's population
      .withColumn("bin", startExpr + col("__band_bin"))
      .withColumn("slot", col("__brank") % col("__per_bin"))
      .select(col(idCol), col(tokensCol), col("band"), col("bin"), col("slot"))
  }

  /** Token-budget corpus carving: keep documents, in deterministic
    * shuffled order (md5 of the id — rerun-stable, engine-portable, same
    * family as [[Sampling]]), until the running token total reaches
    * `budget`; the doc straddling the edge is kept (its first token is in
    * budget). The "give me a ~10B-token sample" primitive: a fraction-based
    * sample needs the mean doc length to hit a token target, this hits it
    * exactly, and the hash order makes the carve a prefix of any larger
    * carve. Costs one narrow prefix-sum pass, not a global sort of the
    * corpus text: only (id, n_tokens, hash) go through the range exchange
    * and the text re-joins by id at the end. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val hashed = df.select(col(idCol), col(tokensCol))
      .withColumn("__order", md5(col(idCol).cast("string")))
    val kept = withStartOffsets(hashed, idCol, tokensCol, numPartitions,
        orderCol = Some("__order"))
      .where(col("start_offset") < budget)
      .select(col(idCol), col("start_offset"))
    df.join(kept, Seq(idCol))
  }
}
