package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints [[graft.Bench.ioCalibrationRowsPerSec]] a few times under the
  * bench session config — run on an idle host to (re)establish the
  * committed SPARK_GRAFT_IO_BASELINE constant. */
object IoCalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("OFF")
    spark.range(2000000).selectExpr("sum(id)").collect() // JIT warmup
    (1 to 3).foreach { i =>
      val r = graft.Bench.ioCalibrationRowsPerSec(spark)
      println(f"[iocalib] pass $i: $r%.0f rows/s (loadavg ${graft.Bench.loadAvg1m()}%.2f)")
    }
    spark.stop()
  }
}
