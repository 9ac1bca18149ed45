package graft

import org.apache.spark.sql.SparkSession

/** Perf harness: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Also measures the STREAMING
  * runtime (materializer fold + databus fanout — the reference's core
  * serving path) so a `flatMapGroupsWithState` or fanout-expression
  * regression lands in the artifact like any batch operator, and writes
  * the full per-query map to BENCH_full_latest.json so per-query history
  * survives the bounded-width stdout tail line. */
object Bench {

  /** Streaming rows for the bench artifact: (name, seconds, rows/sec). */
  private def streamingRows(spark: SparkSession, sfDir: String): Seq[(String, Double, Double)] = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]

    // materializer: drive the full change log through the streaming fold in
    // 5 micro-batches (tools/StreamStress methodology — MemoryStream +
    // processAllAvailable, so the measured time is the state-store fold, not
    // source latency)
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val all = graft.engine.EventLog.changes(spark, sfDir)
        .select("table", "key", "ms", "seq", "node", "delta", "tags")
        .as[graft.resolve.ChangeRow].collect()
      val input = MemoryStream[graft.resolve.ChangeRow]
      val q = graft.streaming.Materializer.materialize(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("bench_stream_out")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt_bench").toString)
        .start()
      try {
        val t0 = System.nanoTime()
        all.grouped(all.length / 5 + 1).foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        out += (("streaming_materializer", secs, all.length / secs))
      } finally q.stop() // a leaked query would contaminate the fanout timing
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming_materializer failed: ${e.getMessage}")
      out += (("streaming_materializer", -1.0, -1.0))
    }

    // fanout at 500 standing subscriptions over the change log — the
    // single-scan MultiSubscriptionMatch path (DefaultFanout's real
    // cardinality); measured as events/s through the match + explode
    try {
      val events = graft.engine.EventLog.changes(spark, sfDir)
        .select("table", "key", "ms", "seq", "node", "tags")
      // the SAME mix FanoutProfile decomposes (one shared definition)
      val subs = graft.tools.FanoutFixtures.subscriptionMix(500)
      val nEvents = events.count()
      val t0 = System.nanoTime()
      graft.streaming.Databus.fanout(events, subs).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      out += (("streaming_fanout500", secs, nEvents / secs))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming_fanout500 failed: ${e.getMessage}")
      out += (("streaming_fanout500", -1.0, -1.0))
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // OFF: executor logs share the forked process's console with the
    // one-line JSON contract; any ERROR interleaving could corrupt it
    spark.sparkContext.setLogLevel("OFF")
    // warmup: JIT + codegen + parquet footer caches, so per-query timings
    // measure the operators rather than JVM warmup
    spark.range(2000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "documents", "embeddings")
      .foreach { t =>
        try graft.engine.Tables.read(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => }
      }
    // events.parquet is TIMESTAMP(NANOS): must go through the Tables.events
    // reader (nanosAsLong), a plain parquet read is an illegal-type error
    try graft.engine.Tables.events(spark, sfDir).limit(1).collect()
    catch { case _: Throwable => }
    // materialize the serving views (continuously maintained in deployment)
    try SparkEntry.warmup(spark, sfDir) catch { case _: Throwable => }
    // two FULL passes over all queries, keep each query's min: single-run
    // numbers on this shared VM swing several-fold on I/O noise, and
    // whole-pass interleaving decorrelates a noise window from both reps of
    // the same query — the min is the steady-state operator cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes = (1 to reps).map { _ =>
      named.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // materialize INTERNAL rows: a bare count() lets Catalyst prune
        // projection expressions and eliminate unique-keyed outer joins, so
        // projection-heavy queries would time only the scan. toRdd pins the
        // full plan (every output column computed) before the action runs.
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    // streaming rows: one pass (a streaming query replays from its own
    // checkpoint, so rep-min semantics don't apply); throughput lands in
    // the full-artifact file
    val streaming = streamingRows(spark, sfDir)
    val results = named.map { case (name, _) =>
      name -> passes.map(_.toMap.apply(name)).min
    } ++ streaming.map { case (n, s, _) => n -> s }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed rows keep their -1 sentinel in the per-query map (visible) but
    // must not SUBTRACT from the headline total a round-over-round diff reads
    val total = results.map(_._2).filter(_ >= 0).sum
    val throughput = streaming.map { case (n, _, rps) =>
      "\"" + n + "_rows_per_sec\":" + f"$rps%.0f" }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"action":"materialize","streaming":$throughput}"""
    println(fullLine)
    // full per-query artifact ON DISK: the stdout tail line below is
    // bounded-width by design (it drops most per-query entries), so the
    // complete map is persisted here for round-over-round diffing
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_full_latest.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_full_latest.json: ${e.getMessage}")
    }
    // The per-query line above grows with the query count and can outrun a
    // log tail window; this compact line is printed LAST so any tail of
    // stdout always contains one complete, parseable JSON record. It keeps
    // the full driver contract shape (metric/value/unit/queries/sf) but
    // carries only a fixed headline subset of queries so its width is
    // bounded regardless of how many operators SparkEntry declares.
    val headline = Seq("resolve_fold", "scan_multi_table", "join_fanout",
      "dedup_minhash", "sim_topk", "stash_roundtrip", "pipeline_curation",
      "cond_bool_algebra", "streaming_materializer", "streaming_fanout500")
    val hq = results.filter { case (k, _) => headline.contains(k) }
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,"n_queries":${results.size},"reps":$reps,"sf":"$sfDir","streaming":$throughput}""")
    spark.stop()
  }
}
