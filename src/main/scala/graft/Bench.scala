package graft

import org.apache.spark.sql.SparkSession

/** Perf harness: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Also measures the STREAMING
  * runtime (materializer fold + databus fanout — the reference's core
  * serving path) so a `flatMapGroupsWithState` or fanout-expression
  * regression lands in the artifact like any batch operator, and writes
  * the full per-query map to BENCH_full_latest.json so per-query history
  * survives the bounded-width stdout tail line.
  *
  * Streaming rows carry THROUGHPUT FLOORS (60% of the committed round-6
  * numbers, env-overridable): a regression below floor is reported in the
  * artifact as `streaming_floor_violations` and on stderr. Floors apply
  * only at sf0.1 (where the committed numbers were measured) — at smaller
  * SFs fixed per-batch commit overhead dominates and rows/s is not
  * comparable. The JSON always prints (a violated floor must not destroy
  * the artifact the next round diffs against). */
object Bench {

  /** Streaming measurements.
    * @return (rows for the queries map: name -> seconds,
    *          throughput entries: name -> value for the streaming map) */
  private def streamingRows(spark: SparkSession, sfDir: String)
      : (Seq[(String, Double)], Seq[(String, Double)]) = {
    import spark.implicits._
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val rates = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    // materializer: drive the full change log through the streaming fold in
    // 5 micro-batches (tools/StreamStress methodology — MemoryStream +
    // processAllAvailable, so the measured time is the state-store fold, not
    // source latency). A 1-row WARMUP batch runs untimed first (the very
    // first micro-batch also pays one-time plan/codegen/state-store-open
    // cost — StreamingThroughputSpec treats it as warmup for the same
    // reason), then a 1-row PROBE batch is timed: its cost is the steady
    // per-batch overhead (RocksDB commit across 32 stores + planning), so
    // the artifact can separate commit overhead (a trigger-interval
    // deployment knob) from fold throughput (the operator cost) — the
    // 5-batch total conflates them.
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
        // warmup batch: 1 row, untimed — absorbs plan/codegen/store-open
        input.addData(all.take(1).toIndexedSeq); q.processAllAvailable()
        // probe batch: 1 row — steady per-batch fixed overhead (global
        // order preserved: warmup + probe rows are the log head, the rest
        // follow in sequence)
        val tp = System.nanoTime()
        input.addData(all.slice(1, 2).toIndexedSeq); q.processAllAvailable()
        val commitSecs = (System.nanoTime() - tp) / 1e9
        val rest = all.drop(2)
        val t0 = System.nanoTime()
        val batches = rest.grouped(rest.length / 5 + 1).toSeq
        batches.foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        times += (("streaming_materializer", secs))
        rates += (("streaming_materializer_rows_per_sec", rest.length / secs))
        rates += (("streaming_materializer_commit_ms", commitSecs * 1000))
        // steady-state fold rate: total minus the fixed per-batch overhead
        // the probe measured (floored at 5% of total so a commit-dominated
        // run reports a conservative rate instead of a wild extrapolation)
        val foldSecs = math.max(secs - batches.length * commitSecs, secs * 0.05)
        rates += (("streaming_materializer_fold_rows_per_sec", rest.length / foldSecs))
      } finally {
        // stop() failing (query already dead) must not re-enter the catch
        // below AFTER the timing rows appended — that would duplicate the
        // keys with sentinels and the last-key-wins JSON reader would mask
        // the real measurement
        try q.stop() // a leaked query would contaminate the fanout timing
        catch { case e: Throwable =>
          System.err.println(s"[bench] materializer stop failed: ${e.getMessage}") }
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming_materializer failed: ${e.getMessage}")
      times += (("streaming_materializer", -1.0))
      // sentinel EVERY materializer key: a missing key reads as "removed"
      // in round-over-round diffs and silently skips its floor check
      rates += (("streaming_materializer_rows_per_sec", -1.0))
      rates += (("streaming_materializer_commit_ms", -1.0))
      rates += (("streaming_materializer_fold_rows_per_sec", -1.0))
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
      times += (("streaming_fanout500", secs))
      rates += (("streaming_fanout500_rows_per_sec", nEvents / secs))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming_fanout500 failed: ${e.getMessage}")
      times += (("streaming_fanout500", -1.0))
      rates += (("streaming_fanout500_rows_per_sec", -1.0))
    }

    // fanout DELIVERY realism: same 500-subscription match, but the matched
    // rows leave through the sink a real subscription delivery pays —
    // foreachBatch writing parquet — instead of a no-op materialize. The
    // delta over streaming_fanout500 is the I/O cost of the ~100×-events
    // output volume.
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val evRows = graft.engine.EventLog.changes(spark, sfDir)
        .select("table", "key", "ms", "seq", "node", "delta", "tags")
        .as[graft.resolve.ChangeRow].collect()
      val subs = graft.tools.FanoutFixtures.subscriptionMix(500)
      val outDir = java.nio.file.Files.createTempDirectory("fanout_sink").toString
      val input = MemoryStream[graft.resolve.ChangeRow]
      val q = input.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.resolve.ChangeRow], _: Long) =>
          graft.streaming.Databus.fanout(
              batch.toDF().select("table", "key", "ms", "seq", "node", "tags"), subs)
            .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt_fanout_sink").toString)
        .start()
      try {
        val t0 = System.nanoTime()
        evRows.grouped(evRows.length / 2 + 1).foreach { b =>
          // one addData call = ONE MemoryStream block = ONE input
          // partition, and the fanout path has no shuffle (scan-local
          // match + explode), so a single block would serialize the whole
          // match + parquet write on one core — measuring MemoryStream's
          // artifact, not the operator. A real bus topic arrives
          // partitioned; 32 blocks per trigger model that.
          b.grouped(b.length / 32 + 1).foreach(c => input.addData(c.toIndexedSeq))
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        times += (("streaming_fanout500_sink", secs))
        rates += (("streaming_fanout500_sink_rows_per_sec", evRows.length / secs))
      } finally {
        try q.stop() // same duplicate-sentinel guard as the materializer
        catch { case e: Throwable =>
          System.err.println(s"[bench] sink stop failed: ${e.getMessage}") }
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming_fanout500_sink failed: ${e.getMessage}")
      times += (("streaming_fanout500_sink", -1.0))
      rates += (("streaming_fanout500_sink_rows_per_sec", -1.0))
    }
    (times.toSeq, rates.toSeq)
  }

  /** True iff ANY path segment is EXACTLY sf0.1 — `sf0.15`/`sf0.125` dirs
    * must not inherit floors that were never measured there, while a
    * layout like `/mnt/bench/sf0.1/parquet` (sf token not last) must not
    * silently disable the gate. */
  private[graft] def isSf01(sfDir: String): Boolean =
    sfDir.split('/').contains("sf0.1")

  /** Throughput floors (rows/sec) for the streaming rows, enforced only at
    * the SF the committed numbers were measured at. End-to-end floors are
    * 60% of committed round artifacts (materializer 19,093 r7; fanout500
    * 11,776 r7; fanout sink 4,471 r7): generous against VM noise, tight
    * against a real (≥2×) regression; the sink floor is 60% of the r8
    * re-baseline (27,051 events/s after the multi-block partitioning fix
    * — the r7 number measured MemoryStream's single-block serialization,
    * not the operator). The FOLD-rate floor is 40% of the LOWER of two
    * consecutive r8 measurements (69,395 and 105,867 rows/s — a 1.5×
    * swing from probe sensitivity alone, after the warmup fix removed the
    * first-batch inflation that had overstated r7's 381k): the fold rate
    * is DERIVED (total − batches × probed commit), so probe noise moves
    * it far more than the end-to-end rows; 40%-of-lower still catches the
    * fold-only ≥3× regression an end-to-end floor would miss behind a
    * commit-time improvement. */
  private def floorViolations(rates: Seq[(String, Double)], sfDir: String): Seq[String] = {
    if (!isSf01(sfDir)) return Seq.empty
    val floors = Map(
      "streaming_materializer_rows_per_sec" ->
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_MATERIALIZER", "11450").toDouble,
      "streaming_fanout500_rows_per_sec" ->
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_FANOUT", "7100").toDouble,
      "streaming_fanout500_sink_rows_per_sec" ->
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_FANOUT_SINK", "16000").toDouble,
      "streaming_materializer_fold_rows_per_sec" ->
        // 27700 = 40% of the LOWER r8 measurement (69,395), per the rule
        // documented above — not a round 28000 that would sit above it
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_MATERIALIZER_FOLD", "27700").toDouble)
    val m = rates.toMap
    floors.toSeq.sortBy(_._1).flatMap { case (name, floor) =>
      m.get(name) match {
        case Some(v) if v < floor =>
          Some(f"$name=$v%.0f below floor $floor%.0f")
        case _ => None
      }
    }
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
    // clamp: reps=0 would leave every per-query min over an empty
    // collection and crash AFTER the streaming section already ran,
    // destroying the artifact the contract promises to always print
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes = (1 to reps).map { _ =>
      named.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // materialize INTERNAL rows: a bare count() lets Catalyst prune
        // projection expressions and eliminate unique-keyed outer joins, so
        // projection-heavy queries would time only the scan. toRdd pins the
        // full plan (every output column computed) before the action runs.
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        // a failed rep records the -1 sentinel, NOT its time-to-failure —
        // elapsed-on-failure would hide the break from BenchDiff.failedCur
        // (and a fast crash would even read as an improvement)
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    // streaming rows: one pass (a streaming query replays from its own
    // checkpoint, so rep-min semantics don't apply); throughput lands in
    // the full-artifact file
    val (streamTimes, streamRates) = streamingRows(spark, sfDir)
    val passMaps = passes.map(_.toMap)
    val results = named.map { case (name, _) =>
      // min over the SUCCESSFUL reps; -1 only when every rep failed
      val good = passMaps.map(_.apply(name)).filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    } ++ streamTimes
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed rows keep their -1 sentinel in the per-query map (visible) but
    // must not SUBTRACT from the headline total a round-over-round diff reads
    val total = results.map(_._2).filter(_ >= 0).sum
    val throughput = streamRates.map { case (n, v) =>
      "\"" + n + "\":" + f"$v%.0f" }.mkString("{", ",", "}")
    val violations = floorViolations(streamRates, sfDir)
    violations.foreach(v => System.err.println(s"[bench] STREAMING FLOOR VIOLATION: $v"))
    val floorJson = violations.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"action":"materialize","streaming":$throughput,"streaming_floor_violations":$floorJson}"""
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
      "cond_bool_algebra", "streaming_materializer", "streaming_fanout500",
      "streaming_fanout500_sink")
    val hq = results.filter { case (k, _) => headline.contains(k) }
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,"n_queries":${results.size},"reps":$reps,"sf":"$sfDir","streaming":$throughput,"streaming_floor_violations":$floorJson}""")
    spark.stop()
  }
}
