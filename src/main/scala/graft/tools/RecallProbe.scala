package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.pipeline.Similarity

/** Scratch probe: measures real-index recall@10 (LSH / IVF / PQ / IVF-PQ vs
  * exact) at a given SF dir so the sim_recall_* floors are set from
  * measurement, at the gates' production settings.
  *
  * `--mult N` (VERDICT r10 #5): recall of bucketed indexes degrades with
  * corpus DENSITY, and the committed floors were calibrated at
  * sf0.01/sf0.1 only. This mode densifies the corpus Nx — each replica is
  * the original vector plus a small deterministic perturbation,
  * re-normalized (sin-hash noise, no RNG), so neighbors crowd the same
  * buckets instead of duplicating — and re-measures all four production
  * indexes at that density. Queries are the UN-perturbed originals
  * (vec_id % mult == 0). Usage:
  *   runMain graft.tools.RecallProbe [sfDir] [--mult N]
  */
object RecallProbe {

  /** Nx-densified corpus: replica r of vector v gets id v*mult+r; r=0 is
    * the verbatim original; replica r>0 is a PSEUDO-RANDOM unit vector
    * (deterministic sin-hash per (id, dim), no RNG). Two earlier cuts of
    * this probe perturbed/interpolated the originals and measured recall
    * 1.00 on all four indexes — any scheme that adds points NEAR the
    * queries hands them trivial top-10s. Unrelated fillers keep each
    * query's true neighbors at their ORIGINAL distances while buckets,
    * probed IVF cells and ADC rerank windows carry Nx the load — the cap
    * truncation / rerank-window crowding that is how a bucketed index
    * actually degrades with corpus density. */
  def densify(emb: DataFrame, mult: Int): DataFrame = {
    val spark = emb.sparkSession
    val origN = emb.count()
    val reps = spark.range(mult).withColumnRenamed("id", "rep")
    emb.crossJoin(reps)
      // BLOCK id layout: originals keep 0..N-1, fillers live above — the
      // production recall gates select queries as `vec_id < 10`, which must
      // keep meaning "real vectors" on a densified fixture
      .withColumn("vec_id", col("vec_id") + col("rep") * origN)
      .withColumn("embedding", expr(
        """CASE WHEN rep = 0 THEN embedding ELSE
           |transform(embedding,
           |  (x, i) -> cast(sin((vec_id * 8191.0d + i) * 2.399963d) as float))
           |END""".stripMargin))
      .withColumn("embedding", expr(
        """transform(embedding, x -> cast(x / sqrt(
           |  aggregate(embedding, 0.0d, (a, y) -> a + cast(y as double) * y))
           |  as float))""".stripMargin))
      .drop("rep")
      .repartition(32) // the crossJoin otherwise inherits 1-2 partitions
  }

  private def report(name: String, exact: DataFrame, approx: DataFrame): Unit = {
    val r = Similarity.recallAtK(exact, approx, k = 10)
      .agg(sum("n_exact"), sum("n_hit")).collect()(0)
    println(f"RECALL_PROBE $name%-16s exact=${r.getLong(0)} hit=${r.getLong(1)} " +
      f"recall=${r.getLong(1).toDouble / r.getLong(0)}%.2f")
  }

  /** All four indexes vs brute force at k=10. Defaults are the committed
    * gates' production settings; `cells/probe/rerank` are the density
    * knobs a deployment turns as the corpus grows (rerank is a FIXED
    * candidate window — at 100x corpus it covers 1/100th the fraction, so
    * scaling it is the recovery, not a tuning trick). */
  def probeAll(emb: DataFrame, queries: DataFrame, label: String = "",
               cells: Int = 16, probe: Int = 8, rerank: Int = 256): Unit = {
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
    report(s"LSH$label", exact, Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 10, planes = 5, bands = 32, maxBucketSize = 20000))
    val (centroids, index) = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCells = cells, iters = 1)
    report(s"IVF$label", exact, Similarity.ivfTopK(centroids, index, queries,
      "vec_id", "embedding", k = 10, nProbe = probe))
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    report(s"PQ$label", exact, Similarity.pqTopK(books,
      Similarity.pqIndex(emb, "vec_id", "embedding", books), queries,
      "vec_id", "embedding", k = 10, rerank = rerank))
    report(s"IVFPQ$label", exact, Similarity.ivfPqTopK(centroids, books,
      Similarity.ivfPqIndex(emb, "vec_id", "embedding", centroids, books), queries,
      "vec_id", "embedding", k = 10, nProbe = probe, rerank = rerank))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.indexOf(a) > 0 && args(args.indexOf(a) - 1) == "--mult")
      .headOption.getOrElse("/root/testdata/sf0.01")
    val mult = args.dropWhile(_ != "--mult").drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb0 = Tables.read(spark, sfDir, "embeddings")
    val (emb, queries) =
      if (mult <= 1) (emb0, emb0.where(col("vec_id") < 10))
      else {
        val big = densify(emb0, mult).localCheckpoint()
        println(s"RECALL_PROBE corpus densified x$mult -> ${big.count()} vectors")
        (big, big.where(col("vec_id") < 10)) // block layout: the originals
      }
    probeAll(emb, queries)
    if (mult > 1) {
      // the density-scaled deployment settings: rerank keeps its corpus
      // FRACTION (256 per 2k vectors), cell count grows ~sqrt-style with
      // the corpus and nProbe keeps its probed fraction
      val rerank = 256 * mult
      val cells = math.max(16, 16 * math.sqrt(mult).toInt)
      probeAll(emb, queries, label = "_scaled",
        cells = cells, probe = cells / 2, rerank = rerank)
    }
    spark.stop()
  }
}
