package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar (int8) embedding quantization — the storage format for
 * billion-vector stores: each vector carries its own affine range
 * (`qmin`, `qscale`) and 8-bit codes, cutting the at-rest and
 * through-the-shuffle footprint ~4x vs float32 while keeping per-dim
 * reconstruction error <= qscale/2. Per-vector (asymmetric) ranges need no
 * training pass and are robust to outlier dims, the standard trade-off vs
 * a global codebook (PQ, [[Similarity.pqTrain]], compresses harder but
 * needs training and a rerank).
 *
 * All arithmetic is double-precision IEEE through codegen'd higher-order
 * functions — floor/divide reproduce bit-identically in any engine, so
 * codes are engine-portable (the oracle replays them in SQL).
 *
 * Degenerate vectors (all dims equal => qscale = 0) encode as all-zero
 * codes and dequantize to the constant `qmin` exactly.
 */
object Quantize {

  /** Quantization levels: codes are 0..255. */
  private val Levels = 255

  /** Struct column (qmin, qscale, codes: array<int>) for an array<float/
    * double> vector. Scan-local, no shuffle.
    *
    * NOTE: as a single Column the range reductions are re-evaluated inside
    * the per-element lambda (higher-order functions are interpreted and
    * Catalyst does not CSE across a lambda boundary — O(dims^2) per row);
    * prefer [[quantizeAll]], which stages qmin/qscale through projection
    * boundaries so each is reduced once per row. */
  def quantize(vecCol: Column): Column = {
    val dv = transform(vecCol, _.cast("double"))
    val qmin = array_min(dv)
    val qscale = (array_max(dv) - qmin) / Levels
    val codes = transform(dv, x =>
      when(qscale === 0.0, lit(0))
        .otherwise(least(lit(Levels), floor((x - qmin) / qscale)).cast("int")))
    struct(qmin.as("qmin"), qscale.as("qscale"), codes.as("codes"))
  }

  /** Midpoint dequantization of a [[quantize]] struct back to
    * array<double>: qmin + (code + 0.5) * qscale (exact qmin for the
    * degenerate qscale = 0 case). Max per-dim error qscale/2. */
  def dequantize(qCol: Column): Column = {
    val qmin = qCol.getField("qmin")
    val qscale = qCol.getField("qscale")
    transform(qCol.getField("codes"), c =>
      when(qscale === 0.0, qmin)
        .otherwise(qmin + (c.cast("double") + 0.5) * qscale))
  }

  /** Corpus in quantized form: (id, qmin, qscale, codes). The range
    * reductions are staged through projection boundaries (CollapseProject
    * keeps non-cheap multi-referenced aliases apart), so qmin/qscale are
    * computed once per row and the code lambda reads scalars — O(dims),
    * not the O(dims^2) a single inlined expression pays. */
  def quantizeAll(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    require(idCol != "dv" && idCol != "qmin" && idCol != "qscale" && idCol != "codes",
      s"id column '$idCol' collides with a quantization output column — alias first")
    df.select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("dv"))
      .select(col("id"), col("dv"), array_min(col("dv")).as("qmin"),
        array_max(col("dv")).as("qmax"))
      .select(col("id"), col("dv"), col("qmin"),
        ((col("qmax") - col("qmin")) / Levels).as("qscale"))
      .select(col("id"), col("qmin"), col("qscale"),
        transform(col("dv"), x =>
          when(col("qscale") === 0.0, lit(0))
            .otherwise(least(lit(Levels), floor((x - col("qmin")) / col("qscale")))
              .cast("int"))).as("codes"))
  }

  /** Exact top-k cosine against a QUANTIZED corpus (queries stay float):
    * the serving path where only the 8-bit store is resident. Same
    * two-phase bounded-heap rank as the float path. */
  def quantizedTopK(qCorpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val c = qCorpus.select(col("id").as("neighbor_id"),
      dequantize(struct(col("qmin"), col("qscale"), col("codes"))).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", Similarity.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    Similarity.rankTopKPerQuery(scored, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
