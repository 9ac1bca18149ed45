package graft.tools

import graft.engine.EventLog
import graft.resolve.ChangeRow
import graft.streaming.Materializer
import org.apache.spark.sql.SparkSession

/** Dev tool: drive the streaming materializer over the full sf0.1 change log
  * in a handful of micro-batches and report changelog throughput. */
object StreamStress {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
    // A/B harness for streaming/state-store configs: comma-separated k=v
    // pairs, e.g. STREAM_STRESS_EXTRA_CONF="spark.x=1,spark.y=2"
    sys.env.get("STREAM_STRESS_EXTRA_CONF").toSeq.flatMap(_.split(','))
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val all = EventLog.changes(spark, "/root/testdata/sf0.1")
      .select("table", "key", "ms", "seq", "node", "delta", "tags")
      .as[ChangeRow].collect()
    println(s"STREAM_STRESS input=${all.length} changes")

    val monitor = new graft.streaming.Databus.LagMonitor
    spark.streams.addListener(monitor)
    val nBatches = sys.env.getOrElse("STREAM_STRESS_BATCHES", "5").toInt
    val reps = sys.env.getOrElse("STREAM_STRESS_REPS", "1").toInt
    // in-JVM reps (fresh stream + checkpoint each) separate steady-state
    // cost from first-run plan/codegen/state-store-open noise; report each
    for (rep <- 1 to reps) {
      val repStartBatches = monitor.batches
      val input = MemoryStream[ChangeRow]
      val q = Materializer.materialize(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(s"stress_out_$rep")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt_stress").toString)
        .start()
      val t0 = System.nanoTime()
      val batches = all.grouped(all.length / nBatches + 1).toSeq
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      val outRows = spark.table(s"stress_out_$rep").count()
      // the listener accumulates across reps; report THIS rep's batch count
      println(f"STREAM_STRESS rep=$rep batches=${batches.size} changes=${all.length} " +
        f"changelog_rows=$outRows secs=$secs%.1f rows_per_sec=${all.length / secs}%.0f " +
        f"monitor_batches=${monitor.batches - repStartBatches}")
      q.stop()
    }
    spark.stop()
  }
}
