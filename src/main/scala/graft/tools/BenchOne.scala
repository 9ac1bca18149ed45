package graft.tools
import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query (or comma list) under the exact Bench
  * session config, to isolate per-query regressions seen only in full runs. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args(0).split(',')
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doWarm = sys.env.get("BENCH_ONE_WARMUP").forall(_ == "1")
    if (doWarm) { try graft.SparkEntry.warmup(spark, sfDir) catch { case _: Throwable => } }
    for (rep <- 1 to sys.env.getOrElse("BENCH_ONE_REPS", "2").toInt; name <- names) {
      val t0 = System.nanoTime()
      // toRdd pins every output column (same action as Bench) — a bare
      // count() lets Catalyst prune projection-heavy plans to the scan
      val n = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[benchone] rep=$rep $name%-24s n=$n%8d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
