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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"))
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_TRACK_ROWS", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
