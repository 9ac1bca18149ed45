package graft.spark

import graft.resolve.ChangeRow
import graft.streaming.Materializer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Catastrophic-regression gate for the streaming materializer — the
  * coarse companion to Bench's fine-grained floors (60% of the committed
  * sf0.1 numbers, which only the per-round bench can judge). This spec
  * drives a synthetic 20k-change log through the full
  * `flatMapGroupsWithState` fold and asserts a floor ~10× below the
  * measured local[4] rate: it can NOT flake on VM noise, but an
  * accidental per-row commit, a driver-side collect, or an O(n²) fold
  * (the regressions that turn 14k rows/s into hundreds) fails `sbt test`
  * instead of shipping to the bench artifact. */
class StreamingThroughputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("materializer fold sustains the catastrophic-regression floor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 20000
    val keys = 4000
    val changes = (0 until n).map { i =>
      ChangeRow("t", s"k${i % keys}", 1000L + i, i.toLong, "n",
        s"""{..,"v":$i}""", Seq.empty)
    }
    val input = MemoryStream[ChangeRow]
    val query = Materializer.materialize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("tput_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_tput").toString)
      .start()
    try {
      // warm batch: plan + state-store open are one-time costs, not fold rate
      input.addData(changes.take(100)); query.processAllAvailable()
      val rest = changes.drop(100)
      val t0 = System.nanoTime()
      rest.grouped(rest.length / 2 + 1).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = rest.length / secs
      info(f"materializer fold: ${rest.length} changes in $secs%.1fs = $rate%.0f rows/s")
      assert(rate > 500.0,
        f"materializer fold rate $rate%.0f rows/s is below the catastrophic " +
          "floor (500/s) — a >10x regression on the local[4] baseline")
      // and the fold must actually have produced the changelog
      assert(spark.table("tput_out").count() > 0)
    } finally query.stop()
  }
}
