package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * DSIR-style data selection via importance resampling (Xie et al., "Data
 * Selection for Language Models via Importance Resampling", NeurIPS 2023 —
 * public method): fit bag-of-(unigram+bigram) categorical distributions
 * over a small TARGET corpus (the domain you want more of) and the RAW
 * corpus, weight every raw document by its log importance ratio
 * `sum_grams [log p_target(g) - log p_raw(g)]` (add-one smoothing), and
 * resample via Gumbel top-k — deterministic here (the Gumbel noise is
 * md5-seeded per id, rerun-stable).
 *
 * Two feature spaces:
 *
 *  - EXACT grams ([[voteScores]]): features are the gram strings
 *    themselves, and the per-gram comparison is integer-cross-multiplied
 *    (`(c_t+1)(N_r+V) > (c_r+1)(N_t+V)` — exactly `p_t(g) > p_r(g)`), so
 *    the per-doc target/raw vote counts are integers an external SQL
 *    engine reproduces bit-for-bit. This is the oracle-gated binarized
 *    DSIR (sign-of-log-ratio voting).
 *  - HASHED buckets ([[logRatios]]/[[logWeights]], the paper's actual
 *    formulation, default 10k buckets): bucket histograms are
 *    driver-sized by construction (B longs), the log-ratio table rides
 *    the plan inside a single-pass expression, and scoring shuffles
 *    nothing. Real-valued weights stay out of the hash oracle
 *    (float-summation order) — they are differentially spec-tested
 *    against a driver-side reference instead, like BM25.
 *
 * Scale shape: the exact path shuffles (gram, count) pairs and one
 * per-instance gram join — the audit/oracle path. The hashed path is the
 * 100 TB path: one explode-aggregate bounded by B per corpus for the
 * histograms, then scan-local scoring and a TakeOrdered global top-k
 * (bounded by k per partition, no full sort).
 */
object Dsir {

  /** Unigram + bigram instances of a document as STRINGS — the builtin
    * cross-check formulation (tokenization parity:
    * split(lower(trim(text)), "\s+")); production paths use the
    * single-pass [[gramHashes]], whose xxhash64-parity with these strings
    * is spec-asserted. */
  def gramInstances(textCol: Column): Column =
    concat(TextAnalysis.tokens(textCol), TextAnalysis.wordNgrams(textCol, 2))

  /**
   * Exact-gram binarized DSIR: per raw document, how many of its gram
   * instances are strictly more likely under the target model than the
   * raw model (`n_target`), and the reverse (`n_raw`). Ties vote neither.
   * `margin = n_target - n_raw` is the integer selection score.
   */
  def voteScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    // grams travel as 64-bit hashes from the first aggregate on: every
    // shuffle/join key is 8 bytes, never a gram string (the standard
    // hash-the-gram convention; a 64-bit collision merging two grams is
    // negligible and the oracle would catch it). Per-(doc, gram) counts
    // first — instances never cross the wire individually.
    // persisted: this per-(doc, gram) table feeds BOTH the corpus gram
    // counts (materialized at plan time by the normalizer head() below) and
    // the per-doc vote join at action time — without the persist the raw
    // corpus is tokenized and aggregated twice per run (same policy as the
    // `counts` persist below)
    val rdg = raw
      .select(col(idCol), explode(gramHashes(col(textCol))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tCounts = target
      .select(explode(gramHashes(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c_t"))
    // corpus gram counts fold the per-doc counts (vocab-sized shuffle of
    // (hash, long) pairs, not a second corpus pass). The vote table is
    // persisted: it is read twice (normalizer scalars now, the per-doc
    // join at action time) and without the persist the action would
    // re-run the whole count lineage — including a second corpus
    // tokenization for tCounts.
    val rCounts = rdg.groupBy("g").agg(sum("cnt").as("c_r"))
    val counts = rCounts.join(tCounts, Seq("g"), "full")
      .na.fill(0L, Seq("c_r", "c_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one vocab-sized pass for the scalar normalizers: V = |raw ∪ target
    // grams|, N = total instances per side
    val tot = counts.agg(count(lit(1)).as("v"), sum("c_r").as("nr"), sum("c_t").as("nt")).head()
    if (tot.getLong(0) == 0L) { // both corpora empty: no votes, empty result
      counts.unpersist()
      rdg.unpersist()
      return raw.select(col(idCol)).where(lit(false))
        .withColumn("n_target", lit(0L)).withColumn("n_raw", lit(0L))
        .withColumn("margin", lit(0L))
    }
    val (v, nR, nT) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    // p_t(g) > p_r(g) without doubles: (c_t+1)/(N_t+V) > (c_r+1)/(N_r+V)
    // cross-multiplied exactly — in DECIMAL(38), because two long factors
    // can exceed 2^63 on a 100 TB corpus and non-ANSI long multiply would
    // wrap silently (19+19 digits always fit in 38)
    val dec = DecimalType(38, 0)
    val lhs = (col("c_t") + 1L).cast(dec) * lit(nR + v).cast(dec)
    val rhs = (col("c_r") + 1L).cast(dec) * lit(nT + v).cast(dec)
    val vote = when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0)
    rdg.join(counts.withColumn("vote", vote).select("g", "vote"), Seq("g"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") === 1, col("cnt")).otherwise(0L)).as("n_target"),
        sum(when(col("vote") === -1, col("cnt")).otherwise(0L)).as("n_raw"))
      .withColumn("margin", col("n_target") - col("n_raw"))
  }

  /** Hashed-bucket gram histogram of a corpus: Array[Long] of size
    * `buckets` (driver-sized by construction — B is a parameter, 10k in
    * the paper). One explode-aggregate, map-side combinable, keyed by
    * bucket id. */
  def bucketHistogram(df: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    val hist = new Array[Long](buckets)
    df.select(explode(gramBuckets(col(textCol), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().foreach(r => hist(r.getInt(0)) = r.getLong(1))
    hist
  }

  /** Per-bucket add-one-smoothed log importance ratios
    * `log p_target(b) - log p_raw(b)` from the two histograms. */
  def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
                buckets: Int = 10000): Array[Double] = {
    val rHist = bucketHistogram(raw, textCol, buckets)
    val tHist = bucketHistogram(target, textCol, buckets)
    val nR = rHist.sum.toDouble + buckets
    val nT = tHist.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      math.log((tHist(b) + 1.0) / nT) - math.log((rHist(b) + 1.0) / nR)
    }
  }

  /** Per-document log importance weight under a fitted ratio table —
    * scan-local single pass (one tokenization, λ rides the plan). */
  def logWeights(df: DataFrame, idCol: String, textCol: String,
                 lambdas: Array[Double]): DataFrame =
    df.select(col(idCol), dsirWeight(col(textCol), lambdas).as("log_w"))

  /**
   * Deterministic Gumbel top-k resample: `key = log_w + Gumbel(md5(id))`.
   * Sampling without replacement from the softmax of weights — the
   * paper's resampling step, rerun-stable because the noise is hashed
   * from the id, never drawn. TakeOrdered top-k: no global sort.
   */
  def resampleTopK(df: DataFrame, idCol: String, textCol: String,
                   lambdas: Array[Double], k: Int): DataFrame = {
    // u in (0,1): the open-interval variant never hits the log singularities
    val u = Sampling.hashUniformOpen(col(idCol))
    val gumbel = -log(-log(u))
    logWeights(df, idCol, textCol, lambdas)
      .withColumn("gumbel_key", col("log_w") + gumbel)
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------------------ expressions

  /** 64-bit hashes of every unigram+bigram instance in one pass — equal to
    * `xxhash64(gram)` over the [[gramInstances]] strings (same XXH64 core,
    * seed 42), without materializing the gram arrays: [[gramInstances]]'s
    * builtin formulation costs two regex tokenizations plus an O(n²)
    * slice-per-bigram walk per document. */
  def gramHashes(textCol: Column): Column =
    GraftBridge.column(GramHashesExpr(GraftBridge.expression(textCol)))

  def gramBuckets(textCol: Column, buckets: Int): Column =
    GraftBridge.column(GramBucketsExpr(GraftBridge.expression(textCol), buckets))

  def dsirWeight(textCol: Column, lambdas: Array[Double]): Column =
    GraftBridge.column(DsirWeightExpr(GraftBridge.expression(textCol), lambdas))
}

/** Shared gram walk of the DSIR feature expressions: the unigram+bigram
  * instance hashes of a tokenized doc, in order — ONE definition so the
  * three expressions below cannot drift (change the feature stream here
  * and hashes/buckets/weights all follow). */
private[pipeline] object GramWalk {
  def hashes(toks: Array[String]): Array[Long] = {
    val n = toks.length
    val nBi = if (n >= 2) n - 1 else 0
    val out = new Array[Long](n + nBi)
    var i = 0
    while (i < n) {
      out(i) = SketchHash.hash(toks(i))
      i += 1
    }
    var b = 0
    while (b < nBi) {
      out(n + b) = SketchHash.hash(toks(b) + " " + toks(b + 1))
      b += 1
    }
    out
  }
}

/** Raw 64-bit gram hashes of every unigram+bigram instance — one
  * tokenization pass; parity with the builtin `xxhash64(gram)` (XXH64,
  * seed 42) is asserted in DsirSpec. */
case class GramHashesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      GramWalk.hashes(SketchHash.tokenize(input.asInstanceOf[UTF8String])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hash buckets of every unigram+bigram instance — one tokenization pass;
  * bucket = floorMod(xxh64(gram, seed=42), B), the same hash the sketch
  * expressions use. */
case class GramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val hs = GramWalk.hashes(SketchHash.tokenize(input.asInstanceOf[UTF8String]))
    val out = new Array[Int](hs.length)
    var i = 0
    while (i < hs.length) {
      out(i) = java.lang.Math.floorMod(hs(i), buckets.toLong).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-doc DSIR log weight: sum of λ(bucket) over unigram+bigram instances
  * — same walk and hash as [[GramBucketsExpr]], summed left-to-right in
  * gram order (deterministic under any partitioning: the sum is per-row). */
case class DsirWeightExpr(child: Expression, lambdas: Array[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val hs = GramWalk.hashes(SketchHash.tokenize(input.asInstanceOf[UTF8String]))
    val b = lambdas.length.toLong
    var sum = 0.0
    var i = 0
    while (i < hs.length) {
      sum += lambdas(java.lang.Math.floorMod(hs(i), b).toInt)
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
