package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler: run one SparkEntry query under the Bench session config and
  * attribute wall time — per-job duration, task time, and the gaps no job
  * covers (driver-side planning/actions) — so tail-query optimization targets
  * the real cost (guide §1: measure first, §7.3: driver-side work is
  * invisible in task metrics). */
object ProfileOne {
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
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = List.empty[(Int, Long, Long, String)] // id, t0, t1, desc
    @volatile var stages = List.empty[(Int, Double, String)] // id, secs, name
    val listener = new SparkListener {
      private val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs = (j.jobId, t0, System.nanoTime(), d) :: jobs
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val secs = (for (a <- i.completionTime; b <- i.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = i.taskMetrics
        val detail = f"tasks=${i.numTasks}%3d run=${m.executorRunTime / 1e3}%6.2f " +
          f"deser=${m.executorDeserializeTime / 1e3}%5.2f gc=${m.jvmGCTime / 1e3}%5.2f " +
          i.details.linesIterator.filter(_.contains("graft")).take(1).mkString
        stages = (i.stageId, secs, detail) :: stages
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val doWarm = sys.env.get("BENCH_ONE_WARMUP").forall(_ == "1")
    if (doWarm) { try graft.SparkEntry.warmup(spark, sfDir) catch { case _: Throwable => } }
    for (rep <- 1 to sys.env.getOrElse("BENCH_ONE_REPS", "2").toInt; name <- names) {
      jobs = Nil
      stages = Nil
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain (private API in Spark 4)
      val total = (t1 - t0) / 1e9
      val sorted = jobs.sortBy(_._2)
      val jobSecs = sorted.map(j => (j._3 - j._2) / 1e9).sum
      // wall time not covered by any job (driver planning, FS ops, collect prep)
      var covered = 0L
      var cursor = t0
      sorted.foreach { case (_, js, je, _) =>
        val s = math.max(js, cursor)
        if (je > s) { covered += je - s; cursor = je }
      }
      val gap = (t1 - t0 - covered) / 1e9
      println(f"[profile] rep=$rep $name%-24s n=$n%8d total=$total%6.2f s " +
        f"jobs=${sorted.size}%3d jobSecs=$jobSecs%6.2f gapSecs=$gap%6.2f")
      if (sys.env.get("PROFILE_ONE_JOBS").contains("1"))
        sorted.foreach { case (id, js, je, d) =>
          println(f"[profile]   job=$id%4d ${(je - js) / 1e9}%6.3f s  ${d.take(90)}")
        }
      if (sys.env.get("PROFILE_ONE_STAGES").contains("1"))
        stages.sortBy(-_._2).take(12).foreach { case (id, secs, nm) =>
          println(f"[profile]   stage=$id%4d $secs%6.3f s  ${nm.take(100)}")
        }
    }
    spark.stop()
  }
}
