package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextClean
object SortProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        println(f"[probe] $name%-22s rep=$i n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    val docs = graft.engine.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def proj = docs.select(col("doc_id"),
      TextClean.emailCount(col("text")).cast("int").as("n_emails"),
      TextClean.urlCount(col("text")).cast("int").as("n_urls"),
      TextClean.phoneCount(col("text")).cast("int").as("n_phones"),
      md5(TextClean.scrub(col("text"))).as("clean_md5"))
    time("proj_nosort") { proj.queryExecution.toRdd.count() }
    time("proj_orderby") { proj.orderBy("doc_id").queryExecution.toRdd.count() }
    spark.stop()
  }
}
