package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SegProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.engine.Tables.read(spark, dir, "documents")
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SEGPROF $name%-22s n=$n%8d ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    // stage 1: seg hashes only
    val toks = split(trim(col("text")), "\\s+")
    val segArr = transform(sequence(lit(0), greatest(size(toks)-1, lit(0)), lit(5)),
      s => concat_ws(" ", slice(toks, s + 1, lit(5))))
    t("segArray-only") {
      corpus.select(explode(segArr).as("seg")).where(col("seg") =!= "").count()
    }
    t("segHashes") {
      corpus.select(col("doc_id"), posexplode(segArr).as(Seq("seg_idx","seg")))
        .where(col("seg") =!= "")
        .select(col("doc_id"), col("seg_idx"), xxhash64(col("seg")).as("h"))
        .queryExecution.toRdd.count()
    }
    val segs = corpus.select(col("doc_id").as("id"), posexplode(segArr).as(Seq("seg_idx","seg")))
      .where(col("seg") =!= "")
      .select(col("id"), col("seg_idx"), xxhash64(col("seg")).as("seg_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("segs-materialize") { segs.count() }
    val condemned = segs.groupBy("seg_hash").agg(countDistinct(col("id")).as("n"))
      .where(col("n") >= 2).select("seg_hash")
    t("condemned") { condemned.count() }
    val dropIdx = segs.join(condemned, Seq("seg_hash"), "left_semi")
      .groupBy("id").agg(sort_array(collect_set(col("seg_idx"))).as("dropped"))
    t("dropIdx") { dropIdx.count() }
    val joined = corpus.join(dropIdx.withColumnRenamed("id","_d"), col("doc_id")===col("_d"), "left")
    t("join-only") { joined.queryExecution.toRdd.count() }
    t("full-rebuild") {
      graft.pipeline.Lines.dedupSegments(corpus, "doc_id", "text", 5, 2)
        .queryExecution.toRdd.count()
    }
    t("full-rebuild-2nd") {
      graft.pipeline.Lines.dedupSegments(corpus, "doc_id", "text", 5, 2)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
