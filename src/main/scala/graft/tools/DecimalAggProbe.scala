package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost of the decimal-exact per-dimension mean (the Lloyd /
  * centroid building block) vs a plain double sum, on the bench corpus
  * shape — quantifies whether the exactness tax is worth optimizing. */
object DecimalAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).persist()
    emb.count()
    def timed(name: String)(f: => Unit): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime(); f
        println(f"DECPROBE $name rep=$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    timed("decimal_mean") {
      emb.select(posexplode(col("vec"))).groupBy("pos")
        .agg((sum(col("col").cast("decimal(38,15)")) / count(lit(1)))
          .cast("double").as("m")).collect()
    }
    timed("double_mean") {
      emb.select(posexplode(col("vec"))).groupBy("pos")
        .agg((sum(col("col").cast("double")) / count(lit(1))).as("m")).collect()
    }
    timed("explode_only") {
      emb.select(posexplode(col("vec"))).groupBy("pos")
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
