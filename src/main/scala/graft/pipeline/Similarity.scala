package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (array<float>), for training-data curation at scale.
 *
 *  - bruteForceTopK: exact cosine top-k via a join + window rank. The
 *    baseline and the verifier. O(Q*N) — fine when one side is small or
 *    broadcastable.
 *  - lshTopK: the scale path — random-hyperplane LSH buckets (sign sketch,
 *    same family as SimHash) so only vectors sharing a bucket are compared.
 *    With b bands of w bits, recall is tunable; candidate generation is an
 *    equi-join on bucket keys — no cross join ever materializes.
 *
 * All arithmetic in double precision via codegen'd higher-order functions
 * (zip_with + aggregate); no UDFs.
 */
object Similarity {

  /** Cosine similarity of two array<float/double> columns, computed in
    * double, summing in index order (deterministic). */
  def cosine(a: Column, b: Column): Column = {
    val prods = zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))
    val dot = aggregate(prods, lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k cosine neighbors of each query vector.
    * Returns (queryIdCol, rank, neighbor id, score). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, broadcastQueries: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val scored = c.join(qSide, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). Shared by all rows — equivalent to a
    * broadcast random matrix without needing an RNG at plan time. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(concat_ws(":", lit("plane"), lit(p), i)), lit(1000003L))
      .cast("double") / 500001.5) - 1.0

  /** Sign-sketch bucket keys: `planes` hyperplane signs grouped into one
    * long key. Vectors in the same bucket are ANN candidates. */
  def lshBucket(vecCol: Column, planes: Int): Column = {
    val dims = size(vecCol)
    val bits = (0 until planes).map { p =>
      val idxs = sequence(lit(0), dims - 1)
      val dot = aggregate(
        zip_with(vecCol, idxs, (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets with `bands` independent sketches: compare
    * only within matching buckets, union candidates, exact-rank them.
    * Bucket keys come from the single-pass [[sketches.hyperplaneSketch]]
    * expression (same keys as the builtin [[lshBucketBand]] formulation). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12, bands: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
          posexplode(sketches.hyperplaneSketch(col(vecCol), planes, bands)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    }
    val c = bucketed(corpus, "neighbor_id", "cv")
    val q = bucketed(queries, "query_id", "qv")
    val candidates = c.join(q, Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct()
    val scored = candidates.withColumn("score", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** One band's bucket key via builtins (cross-check formulation):
    * planes [band*planes, (band+1)*planes). */
  def lshBucketBand(vecCol: Column, planes: Int, band: Int): Column = {
    val dims = size(vecCol)
    val bits = (0 until planes).map { p =>
      val plane = band * planes + p
      val idxs = sequence(lit(0), dims - 1)
      val dot = aggregate(
        zip_with(vecCol, idxs, (v, i) => v.cast("double") * planeComponent(plane, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
