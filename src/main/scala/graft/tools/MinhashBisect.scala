package graft.tools
import graft.engine.Tables
import graft.pipeline.{Dedup, sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of dedup_minhash under the Bench session
  * config, to locate the 40s-vs-7s discrepancy between Bench and
  * MinhashProfile. */
object MinhashBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bisect] $name%-28s n=$n%10d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val docs = Tables.read(spark, sfDir, "documents")
    time("docs")(docs.count())
    val withSig = docs.select(col("doc_id").as("id"), sketches.minhash(col("text"), 2, 32).as("sig"))
    val allBands = Dedup.minhashBands(withSig, "id", "sig", 8, 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("bands-persist")(allBands.count())
    val bucketSizes = allBands.groupBy("band", "band_hash").agg(count(lit(1)).as("bucket_n"))
    val bandsDf = allBands.join(
      bucketSizes.where(col("bucket_n") <= 1000).select("band", "band_hash"),
      Seq("band", "band_hash"), "left_semi")
    time("bands-capped")(bandsDf.count())
    val candidates = bandsDf.as("l").join(bandsDf.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    time("candidates")(candidates.count())
    val sh = docs.select(col("doc_id").as("id"),
      transform(Dedup.wordShingles(col("text"), 2), s => xxhash64(s)).as("shingles"))
    time("shingles")(sh.count())
    val verified = candidates
      .join(sh.select(col("id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(sh.select(col("id").as("id2"), col("shingles").as("sh2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .where(col("jaccard") >= 0.3)
      .select("id1", "id2", "jaccard")
    time("verify-join")(verified.count())
    time("full-again")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 2, 32, 8, 0.3).count())
    spark.stop()
  }
}
