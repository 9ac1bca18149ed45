package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.pipeline.Similarity

/** Scratch probe: measures real-index recall@10 (LSH / IVF-PQ vs exact) at
  * a given SF dir so the sim_recall_* floors are set from measurement. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.read(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)

    for ((planes, bands, cap) <- Seq((5, 32, 20000))) {
      val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 10, planes = planes, bands = bands, maxBucketSize = cap)
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(sum("n_exact"), sum("n_hit")).collect()(0)
      println(s"LSH planes=$planes bands=$bands cap=$cap: exact=${r.getLong(0)} hit=${r.getLong(1)} recall=${r.getLong(1).toDouble / r.getLong(0)}")
    }

    for ((cells, probe) <- Seq((16, 8))) {
      val (centroids, index) = Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCells = cells, iters = 1)
      val approx = Similarity.ivfTopK(centroids, index, queries,
        "vec_id", "embedding", k = 10, nProbe = probe)
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(sum("n_exact"), sum("n_hit")).collect()(0)
      println(s"IVF cells=$cells probe=$probe: exact=${r.getLong(0)} hit=${r.getLong(1)}")
    }

    for ((m, kc, rerank) <- Seq((8, 16, 256))) {
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = m, k = kc, iters = 1)
      val index = Similarity.pqIndex(emb, "vec_id", "embedding", books)
      val approx = Similarity.pqTopK(books, index, queries,
        "vec_id", "embedding", k = 10, rerank = rerank)
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(sum("n_exact"), sum("n_hit")).collect()(0)
      println(s"PQ m=$m k=$kc rerank=$rerank: exact=${r.getLong(0)} hit=${r.getLong(1)}")
    }

    for ((cells, probe, rerank) <- Seq((16, 8, 256))) {
      val (centroids, _) = Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCells = cells, iters = 1)
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
      val index = Similarity.ivfPqIndex(emb, "vec_id", "embedding", centroids, books)
      val approx = Similarity.ivfPqTopK(centroids, books, index, queries,
        "vec_id", "embedding", k = 10, nProbe = probe, rerank = rerank)
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(sum("n_exact"), sum("n_hit")).collect()(0)
      println(s"IVFPQ cells=$cells probe=$probe rerank=$rerank: exact=${r.getLong(0)} hit=${r.getLong(1)} recall=${r.getLong(1).toDouble / r.getLong(0)}")
    }
    spark.stop()
  }
}
