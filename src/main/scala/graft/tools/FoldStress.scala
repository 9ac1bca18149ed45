package graft.tools

import graft.engine.EventLog
import graft.resolve.ResolveEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev tool: stress the resolve fold at a multiple of sf0.1 to sanity-check
 * the scale story (throughput per core, no per-group memory blowup).
 * Replicates the sf0.1 change log N times across N times as many documents.
 */
object FoldStress {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = EventLog.changes(spark, "/root/testdata/sf0.1")
    val replicas = spark.range(mult).withColumnRenamed("id", "rep")
    val big = base.crossJoin(replicas)
      .withColumn("key", concat(col("key"), lit("#"), col("rep")))
      .drop("rep")
    // materialize to a multi-file parquet source: models a real table scan
    // (the raw crossJoin has 1-2 input partitions, serializing the map side)
    val tmp = System.getProperty("java.io.tmpdir") + "/fold_stress_input"
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    val bigSrc = spark.read.parquet(tmp)
    val n = bigSrc.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"FOLD_STRESS $name%-12s rows=$n out=$out secs=$secs%.1f rows_per_sec=${n / secs}%.0f")
    }
    time("scan")(bigSrc.count())
    import org.apache.spark.sql.functions.{col => c}
    time("shuffle+sort")(bigSrc.repartition(c("table"), c("key"))
      .sortWithinPartitions("table", "key", "ms", "seq", "node").count())
    time("parse-only") {
      import spark.implicits._
      bigSrc.select("delta").as[String].mapPartitions { it =>
        var n = 0L; it.foreach { d => graft.delta.DslParser.parseDelta(d); n += 1 }
        Iterator.single(n)
      }.reduce(_ + _)
    }
    time("fold")(ResolveEngine.resolve(bigSrc).count())
    spark.stop()
  }
}
