package graft.tools
import graft.engine.Tables
import graft.pipeline.{Dedup, sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s n=$n%10d  ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    time("docs")(docs.count())
    time("signatures")(docs.select(sketches.minhash(col("text"), 2, 32).as("sig")).count())
    val withSig = docs.select(col("doc_id").as("id"), sketches.minhash(col("text"), 2, 32).as("sig"))
    val bandsDf = Dedup.minhashBands(withSig, "id", "sig", 8, 4)
    time("bands")(bandsDf.count())
    val cand = bandsDf.as("l").join(bandsDf.as("r"),
      col("l.band")===col("r.band") && col("l.band_hash")===col("r.band_hash") && col("l.id")<col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2")).distinct()
    time("candidates")(cand.count())
    val dist = bandsDf.groupBy("band","band_hash").count()
      .selectExpr("CASE WHEN count<10 THEN '<10' WHEN count<100 THEN '<100' WHEN count<500 THEN '<500' ELSE '>=500' END AS bucket_size","count*(count-1)/2 AS pairs")
      .groupBy("bucket_size").agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_buckets"), org.apache.spark.sql.functions.sum("pairs").as("raw_pairs"))
    dist.orderBy("bucket_size").collect().foreach(r => println(s"BUCKETS ${r.mkString(" ")}"))
    time("full")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 2, 32, 8, 0.3).count())
    spark.stop()
  }
}
