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

  /** Temp hygiene for the streaming fixtures: each rep writes a sink output
    * (~hundreds of MB of delivered-row parquet) and a checkpoint dir, and
    * repeated runs on one host (the driver benches at TWO core counts
    * back-to-back) accumulate enough /tmp litter + dirty pages to degrade
    * the later runs' disk-bound sink row — measured on this host as a
    * 59k -> 21k rows/s sink collapse with a still-healthy io-calibration.
    * Deleted OUTSIDE the timed window; failures logged, never fatal. */
  private def deleteRecursive(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p)) {
        // children delete before parents via reverse lexicographic path
        // sort (sorted() buffers the stream internally — same memory as
        // the Seq it replaced, just without the extra Scala copy)
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] temp cleanup failed for $dir: ${e.getMessage}")
    }

  /** Streaming measurements: each row measured `streamReps` times
    * (min-of-reps on every time, best-of-reps on every derived rate — the
    * same rep-min semantics the batch queries get; each rep uses a FRESH
    * checkpoint dir so rep 2 replays nothing) with the per-rep values
    * emitted alongside the headline so bimodality is visible in ONE run's
    * artifact instead of across two rounds'.
    * @return (rows for the queries map: name -> seconds,
    *          throughput entries: name -> value for the streaming map) */
  private[graft] def streamingRows(spark: SparkSession, sfDir: String)
      : (Seq[(String, Double)], Seq[(String, Double)]) = {
    import spark.implicits._
    val streamReps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "2").toInt)
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val rates = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    // one collect of the change log shared by every rep of every row
    val all = graft.engine.EventLog.changes(spark, sfDir)
      .select("table", "key", "ms", "seq", "node", "delta", "tags")
      .as[graft.resolve.ChangeRow].collect()
    val subs = graft.tools.FanoutFixtures.subscriptionMix(500)

    /** Runs `rep` once per rep; merges: times (and *_ms keys) keep the MIN
      * successful value, rates keep the MAX (best rep = steady-state, same
      * reasoning as the batch rep-min); every per-rep value is ALSO
      * emitted as `<key>_repN` so one artifact shows rep disagreement.
      * A rep that throws records -1 sentinels for every key of the row
      * (a missing key reads as "removed" in round-over-round diffs and
      * silently skips its floor check). */
    def repped(rowName: String, timeKeys: Seq[String], rateKeys: Seq[String])
              (rep: Int => Seq[(String, Double)]): Unit = {
      val perRep: Seq[Map[String, Double]] = (1 to streamReps).map { i =>
        try rep(i).toMap
        catch { case e: Throwable =>
          System.err.println(s"[bench] $rowName rep $i failed: ${e.getMessage}")
          (timeKeys ++ rateKeys).map(_ -> -1.0).toMap
        }
      }
      def merged(key: String, lowerIsBetter: Boolean): Double =
        mergeReps(perRep.flatMap(_.get(key)), lowerIsBetter)
      timeKeys.foreach { k =>
        if (k == rowName) times += ((k, merged(k, lowerIsBetter = true)))
        else rates += ((k, merged(k, lowerIsBetter = true)))
      }
      rateKeys.foreach(k => rates += ((k, merged(k, lowerIsBetter = false))))
      if (streamReps > 1)
        for (i <- 1 to streamReps; k <- timeKeys ++ rateKeys)
          rates += ((s"${k}_rep$i", perRep(i - 1).getOrElse(k, -1.0)))
    }

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
    repped("streaming_materializer",
      timeKeys = Seq("streaming_materializer", "streaming_materializer_commit_ms"),
      rateKeys = Seq("streaming_materializer_rows_per_sec",
        "streaming_materializer_fold_rows_per_sec",
        "streaming_materializer_state_rows",
        "streaming_materializer_state_bytes")) { repNo =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[graft.resolve.ChangeRow]
      val ckptDir = java.nio.file.Files.createTempDirectory("ckpt_bench").toString
      val q = graft.streaming.Materializer.materialize(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(s"bench_stream_out_$repNo")
        .option("checkpointLocation", ckptDir)
        .start()
      try {
        // warmup (1 row) + two probes (1 row each) + ≥1 measured row: the
        // derived fold rate is meaningless on a shorter log (empty probe
        // batches time near zero and silently inflate the rate)
        require(all.length > 3,
          s"change log too small to probe commit overhead (${all.length} rows)")
        // warmup batch: 1 row, untimed — absorbs plan/codegen/store-open
        input.addData(all.take(1).toIndexedSeq); q.processAllAvailable()
        // probe batches: TWO 1-row batches, min taken — the fold rate is
        // DERIVED (total − batches × probed commit), so one slow probe
        // (GC pause, RocksDB compaction tick) overstates the subtraction
        // until the 5%-of-total clamp fires and the rate reads as the
        // clamp, not the operator (r10's BenchDiff advisory caught reps
        // splitting 364k/66k from exactly this). Min-of-2 bounds the
        // commit estimate by the QUIETER probe; global order preserved —
        // warmup + probes are the log head, the rest follow in sequence.
        val commitSecs = (1 to 2).map { i =>
          val tp = System.nanoTime()
          input.addData(all.slice(i, i + 1).toIndexedSeq); q.processAllAvailable()
          (System.nanoTime() - tp) / 1e9
        }.min
        val rest = all.drop(3)
        val t0 = System.nanoTime()
        val batches = rest.grouped(rest.length / 5 + 1).toSeq
        batches.foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        // steady-state fold rate: total minus the fixed per-batch overhead
        // the probe measured (floored at 5% of total so a commit-dominated
        // run reports a conservative rate instead of a wild extrapolation)
        val foldSecs = math.max(secs - batches.length * commitSecs, secs * 0.05)
        // state-store telemetry (VERDICT r10 #6): at 100 TB the
        // materializer is STATE-bound — one FoldState per live coordinate —
        // so the artifact carries rows/bytes from the last committed batch
        // (telemetry only, no floor; -1 when the progress carries no state
        // operator, e.g. a future operator rewrite)
        val state = q.recentProgress.reverse
          .flatMap(_.stateOperators.toSeq).headOption
        // with row-count tracking disabled (the default since r12) RocksDB
        // reports numRowsTotal=0 — indistinguishable from genuinely empty
        // state, so emit the -1 missing-metric sentinel instead of a
        // plausible-looking 0
        val trackRows = spark.conf
          .getOption("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows")
          .forall(_.toBoolean)
        Seq("streaming_materializer" -> secs,
          "streaming_materializer_rows_per_sec" -> rest.length / secs,
          "streaming_materializer_commit_ms" -> commitSecs * 1000,
          "streaming_materializer_fold_rows_per_sec" -> rest.length / foldSecs,
          "streaming_materializer_state_rows" ->
            (if (!trackRows) -1.0
             else state.map(_.numRowsTotal.toDouble).getOrElse(-1.0)),
          "streaming_materializer_state_bytes" ->
            state.map(_.memoryUsedBytes.toDouble).getOrElse(-1.0))
      } finally {
        try q.stop() // a leaked query would contaminate the fanout timing
        catch { case e: Throwable =>
          System.err.println(s"[bench] materializer stop failed: ${e.getMessage}") }
        deleteRecursive(ckptDir)
      }
    }

    // fanout at 500 standing subscriptions over the change log — the
    // single-scan MultiSubscriptionMatch path (DefaultFanout's real
    // cardinality); measured as events/s through the match + explode.
    //
    // PARALLELISM (r12, guide §2): the sf corpus is ONE small parquet file
    // = ONE scan partition, so the match+explode ran single-threaded at any
    // core count — PERF_r11 measured an 8-vs-32-core ratio of exactly 1.00
    // (6.18 s both) on this row. That is a bench-input artifact, not an
    // operator cost: a real feed arrives partitioned (the sink row's
    // 32-block MemoryStream shape, a Kafka topic). The batch is therefore
    // distributed to the session's parallelism INSIDE the timed window; the
    // round-robin shuffle of ~100k narrow rows is a few percent of the row
    // and is honestly charged to it.
    repped("streaming_fanout500",
      timeKeys = Seq("streaming_fanout500"),
      rateKeys = Seq("streaming_fanout500_rows_per_sec")) { _ =>
      val events = graft.engine.EventLog.changes(spark, sfDir)
        .select("table", "key", "ms", "seq", "node", "tags")
      val nEvents = events.count()
      val par = spark.sparkContext.defaultParallelism
      val t0 = System.nanoTime()
      graft.streaming.Databus.fanout(events.repartition(par), subs)
        .queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Seq("streaming_fanout500" -> secs,
        "streaming_fanout500_rows_per_sec" -> nEvents / secs)
    }

    // fanout DELIVERY realism: same 500-subscription match, but the matched
    // rows leave through the sink a real subscription delivery pays —
    // foreachBatch writing parquet — instead of a no-op materialize. The
    // delta over streaming_fanout500 is the I/O cost of the ~100×-events
    // output volume.
    //
    // DETERMINISM (the r8 lesson): one addData call = ONE MemoryStream
    // block = ONE input partition, and the fanout path has no shuffle
    // (scan-local match + explode), so the block→batch mapping decides how
    // parallel the batch is. Feeding blocks while the query RUNS races the
    // micro-batch planner — the engine snapshots whatever blocks have
    // landed when a batch starts, so the same code measured 3.7 s or
    // 27.0 s depending on thread timing (r8's bimodal artifact). Fix: add
    // ALL 32 blocks BEFORE start() and run with Trigger.AvailableNow() —
    // the engine fixes the end offset at start, consuming the full feed as
    // one 32-partition batch (the Kafka topic shape), every run.
    repped("streaming_fanout500_sink",
      timeKeys = Seq("streaming_fanout500_sink"),
      rateKeys = Seq("streaming_fanout500_sink_rows_per_sec")) { _ =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val outDir = java.nio.file.Files.createTempDirectory("fanout_sink").toString
      val ckptDir = java.nio.file.Files.createTempDirectory("ckpt_fanout_sink").toString
      val input = MemoryStream[graft.resolve.ChangeRow]
      all.grouped(all.length / 32 + 1).foreach(c => input.addData(c.toIndexedSeq))
      val t0 = System.nanoTime()
      val q = input.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.resolve.ChangeRow], _: Long) =>
          graft.streaming.Databus.fanout(
              batch.toDF().select("table", "key", "ms", "seq", "node", "tags"), subs)
            .write.mode("append").parquet(outDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckptDir)
        .start()
      try {
        q.awaitTermination()
        val secs = (System.nanoTime() - t0) / 1e9
        Seq("streaming_fanout500_sink" -> secs,
          "streaming_fanout500_sink_rows_per_sec" -> all.length / secs)
      } finally {
        try q.stop() // AvailableNow self-terminates; stop() is a no-op guard
        catch { case e: Throwable =>
          System.err.println(s"[bench] sink stop failed: ${e.getMessage}") }
        deleteRecursive(outDir) // ~19M delivered rows of parquet per rep
        deleteRecursive(ckptDir)
      }
    }
    (times.toSeq, rates.toSeq)
  }

  /** Same-run I/O calibration (VERDICT r9 #1): times a fixed synthetic
    * parquet write — 2M change-row-shaped rows across the session's 32
    * partitions, the same shape and writer path the fanout sink pays — and
    * returns rows/sec. The sink row is the one disk-BOUND gate in the set:
    * across r7–r9 its throughput collapsed ~6× under driver-host disk
    * contention while CPU-bound rows moved ~1.2×, so an absolute floor
    * misfires exactly when the host is busy. This number, measured seconds
    * before the streaming rows, lets the floor scale with the host's
    * ACTUAL write capacity at gate time (and lands in the artifact so a
    * violation self-adjudicates without a judge re-run). Best-of-2: the
    * calibration must read "capacity now", not "one unlucky fsync". */
  private[graft] def ioCalibrationRowsPerSec(spark: SparkSession): Double = {
    val n = 2000000L
    (1 to 2).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("io_calib")
      val df = spark.range(n).selectExpr(
        "concat('review:probe', id % 97) AS table",
        "concat('key', id) AS key",
        "id AS ms",
        "id % 32 AS seq",
        "concat('node', id % 8) AS node",
        "concat('{\"rating\":', id % 5, '}') AS delta",
        "array('etl') AS tags")
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(dir.toString)
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      try { // temp hygiene: ~90 MB per calibration pass
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close() // the walk Stream holds directory FDs until closed
      } catch { case e: Throwable =>
        System.err.println(s"[bench] io-calibration cleanup failed: ${e.getMessage}")
      }
      rate
    }.max
  }

  /** 1-minute loadavg from /proc/loadavg (−1 where unreadable) — the
    * second host-state telemetry key the r9 adjudication was missing. */
  private[graft] def loadAvg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Rep-merge rule for streaming rows (unit-tested in BenchDiffSpec):
    * failed reps (-1 sentinels) are dropped; the survivors merge as MIN
    * for times/commit-ms (lower is better — same semantics as the batch
    * queries' rep-min) and MAX for rates (best rep = steady state, the
    * cold first rep pays plan/codegen). All-failed => the -1 sentinel. */
  private[graft] def mergeReps(values: Seq[Double], lowerIsBetter: Boolean): Double = {
    val good = values.filter(_ >= 0)
    if (good.isEmpty) -1.0 else if (lowerIsBetter) good.min else good.max
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
    * 11,776 r7): generous against VM noise, tight against a real (≥2×)
    * regression. The sink floor is 60% of the r9 re-baseline — 46,645
    * events/s, the LOWEST of three consecutive runs of the DETERMINISTIC
    * harness (60,694 / 61,776 / 46,645 — the first two idle-host, the
    * third sharing the host with a test run, which is the honest worst
    * case for a driver-side execution; the r8 floor guarded a bimodal
    * measurement that swung 3.7–27 s on thread timing, and its 16,000 was
    * derived from one lucky mode). The gated value is best-of-reps, which
    * absorbs the cold first rep (~32–56k observed) by design; 60%-of-lowest
    * still fires on any real ≥2× regression from the ~61k idle-host rate.
    * The FOLD-rate floor is 40% of the LOWER of two
    * consecutive r8 measurements (69,395 and 105,867 rows/s — a 1.5×
    * swing from probe sensitivity alone, after the warmup fix removed the
    * first-batch inflation that had overstated r7's 381k): the fold rate
    * is DERIVED (total − batches × probed commit), so probe noise moves
    * it far more than the end-to-end rows; 40%-of-lower still catches the
    * fold-only ≥3× regression an end-to-end floor would miss behind a
    * commit-time improvement.
    *
    * @param ioScale host-write-capacity scale from [[ioCalibrationRowsPerSec]]
    *   vs the committed idle-host baseline, clamped to [0.2, 1.0] by the
    *   caller. Scales ONLY the sink floor — the one disk-bound row; the
    *   clamp's 1.0 cap keeps the committed absolute floor as the idle-host
    *   upper gate, and the 0.2 lower bound means even a pathologically
    *   contended host still gates a ≥5×-the-scaled-expectation collapse. */
  private[graft] def floorViolations(rates: Seq[(String, Double)], sfDir: String,
                                     ioScale: Double = 1.0): Seq[String] = {
    if (!isSf01(sfDir)) return Seq.empty
    val floors = Map(
      "streaming_materializer_rows_per_sec" ->
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_MATERIALIZER", "11450").toDouble,
      "streaming_fanout500_rows_per_sec" ->
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_FANOUT", "7100").toDouble,
      "streaming_fanout500_sink_rows_per_sec" ->
        // 27900 = 60% of 46,645 (lowest of three consecutive r9 runs of
        // the deterministic AvailableNow harness), per the rule above —
        // then scaled by the same-run I/O calibration: this is the only
        // disk-bound floor, and r7–r9 showed it collapsing ~6× under host
        // disk contention while every CPU-bound row drifted ~1.2×
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_FANOUT_SINK", "27900").toDouble
          * ioScale,
      "streaming_materializer_fold_rows_per_sec" ->
        // 27700 = 40% of the LOWER r8 measurement (69,395), per the rule
        // documented above — not a round 28000 that would sit above it
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_MATERIALIZER_FOLD", "27700").toDouble)
    // CEILINGS for lower-is-better rows: commit_ms is the trigger-interval
    // deployment knob the fold-rate decomposition exposes — without a gate
    // a 5× commit-cost regression hides behind any fold improvement. 2500
    // = ~3× the stable r8/r9 measurement (809-837 ms): commit cost is
    // RocksDB fsync + 32-store bookkeeping, noisier than throughput on a
    // shared VM, so the ceiling is deliberately looser than the 60% floors.
    val ceilings = Map(
      "streaming_materializer_commit_ms" ->
        sys.env.getOrElse("SPARK_GRAFT_CEIL_COMMIT_MS", "2500").toDouble)
    val m = rates.toMap
    floors.toSeq.sortBy(_._1).flatMap { case (name, floor) =>
      m.get(name) match {
        case Some(v) if v < floor =>
          Some(f"$name=$v%.0f below floor $floor%.0f")
        case _ => None
      }
    } ++ ceilings.toSeq.sortBy(_._1).flatMap { case (name, ceil) =>
      m.get(name) match {
        // a -1 sentinel already fails its row's floor; don't double-report
        case Some(v) if v >= 0 && v > ceil =>
          Some(f"$name=$v%.0f above ceiling $ceil%.0f")
        case _ => None
      }
    }
  }

  /** The bench session. Every measurement main (Bench, and A/B tools like
    * StreamRowsBench) MUST build its session here, so a config knob added
    * to the bench can never silently drift out of the tool that claims to
    * reproduce the bench session. Honors SPARK_GRAFT_CPUS and the
    * state-store env knobs. */
  private[graft] def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing moves the RocksDB snapshot upload out of the
      // commit path (background maintenance uploads changelogs instead of
      // full zips) — the standard production setting for RocksDB state
      // stores; r11's StreamStress A/B measured 36.7 s -> 28.0 s over 25
      // batches, and r12's interleaved driver-methodology A/B confirmed
      // 20-30% on the materializer row. Env-overridable so a deployment can
      // A/B it; scale-independent (the saving grows with state size).
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"))
      // row-count tracking costs a get-before-put per state update purely to
      // maintain the numRowsTotal metric; disabling it is the documented
      // production setting for update-heavy large state and measured -12%
      // on the commit-heavy StreamStress A/B (interleaved: 31.4->27.5 s,
      // 30.0->26.3 s). Env-overridable; with tracking off the
      // streaming_materializer_state_rows telemetry emits the -1
      // missing-metric sentinel (state_bytes is unaffected) — documented in
      // OPTIMIZATION_r12.md, no floor reads it; set the env to true to
      // restore the exact count.
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_TRACK_ROWS", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    // the one-line JSON contract uses f-interpolated fractional numbers,
    // which format under the DEFAULT locale — pin it so a comma-decimal
    // locale can never emit {"loadavg_1m":3,35} and corrupt the artifact
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = buildSession()
    // OFF: executor logs share the forked process's console with the
    // one-line JSON contract; any ERROR interleaving could corrupt it
    spark.sparkContext.setLogLevel("OFF")
    // warmup: JIT + codegen + parquet footer caches, so per-query timings
    // measure the operators rather than JVM warmup. Wall-clock recorded in
    // the artifact (host telemetry — a slow warmup flags a cold/contended
    // host without a judge-side re-run).
    val warmT0 = System.nanoTime()
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
    val warmupSecs = (System.nanoTime() - warmT0) / 1e9
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
    // I/O calibration immediately BEFORE the streaming rows (the sink row
    // is the only disk-bound gate — the calibration must read the host
    // state the sink will actually see, not the state at JVM start).
    // Baseline 3.4M rows/s ≈ the LOW END of six builder-host measurements
    // of this exact calibration under loadavg 1.3–3.1 (2.88–4.94M
    // observed, IoCalibProbe): on a healthy host the scale clamps to 1.0
    // and the committed absolute floor applies; under the ~6× disk
    // collapse the r7–r9 driver runs showed, the scale bottoms at 0.2 and
    // the sink row still gates a ≥5×-the-scaled-expectation regression.
    val ioCalib = ioCalibrationRowsPerSec(spark)
    val ioBaseline =
      sys.env.getOrElse("SPARK_GRAFT_IO_BASELINE", "3400000").toDouble
    val ioScale = math.min(1.0, math.max(0.2, ioCalib / ioBaseline))
    val load1m = loadAvg1m()
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
    val violations = floorViolations(streamRates, sfDir, ioScale)
    violations.foreach(v => System.err.println(s"[bench] STREAMING FLOOR VIOLATION: $v"))
    val floorJson = violations.map("\"" + _ + "\"").mkString("[", ",", "]")
    // host-state telemetry (VERDICT r9 #2): with these four keys a floor
    // violation self-adjudicates — io_floor_scale is the exact multiplier
    // applied to the sink floor, loadavg/warmup corroborate contention
    val hostJson = f"""{"loadavg_1m":$load1m%.2f,"io_calibration_rows_per_sec":$ioCalib%.0f,"io_floor_scale":$ioScale%.3f,"warmup_secs":$warmupSecs%.1f}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"action":"materialize","streaming":$throughput,"streaming_floor_violations":$floorJson,"host":$hostJson}"""
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,"n_queries":${results.size},"reps":$reps,"sf":"$sfDir","streaming":$throughput,"streaming_floor_violations":$floorJson,"host":$hostJson}""")
    spark.stop()
  }
}
