package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONLY the bench's streaming rows (graft.Bench.streamingRows,
  * the exact driver-methodology measurement — warmup batch, min-of-2 commit
  * probes, rep merging) under the exact bench session config, so a
  * config knob (e.g. SPARK_GRAFT_ROCKSDB_CHANGELOG) can be A/B'd in
  * interleaved process-level runs without paying the 6-minute full bench
  * per arm. Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / the changelog
  * env exactly like graft.Bench. Prints one JSON line. */
object StreamRowsBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the session comes from the ONE bench builder, so a config knob added
    // to the bench can never drift out of this A/B tool
    val spark = graft.Bench.buildSession()
    spark.sparkContext.setLogLevel("OFF")
    // minimal JIT/codegen warmup, as in Bench.main
    spark.range(2000000).selectExpr("sum(id)").collect()
    val load0 = graft.Bench.loadAvg1m()
    val (times, rates) = graft.Bench.streamingRows(spark, sfDir)
    val kv = (times ++ rates).map { case (k, v) => f""""$k":$v%.3f""" }
    println(s"""{"changelog":${sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true")},"loadavg_pre":$load0,"loadavg_post":${graft.Bench.loadAvg1m()},${kv.mkString(",")}}""")
    spark.stop()
  }
}
