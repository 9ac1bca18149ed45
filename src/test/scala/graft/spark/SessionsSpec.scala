package graft.spark

import graft.streaming.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap sessionization: pinned golden sessions, a single-threaded
  * differential on random event streams, and parity with Structured
  * Streaming's session_window on the same gap. */
class SessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden: gaps split sessions per entity; ties break on id") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: two sessions (gap 100 between t=250 and t=1000)
      (1L, 10L, 100L), (1L, 11L, 150L), (1L, 12L, 250L),
      (1L, 13L, 1000L), (1L, 14L, 1050L),
      // user 2: equal timestamps — order pinned by event_id; one session
      (2L, 20L, 500L), (2L, 21L, 500L),
      // user 3: gap exactly == threshold stays in-session (strict >)
      (3L, 30L, 0L), (3L, 31L, 100L)
    ).toDF("user_id", "event_id", "ts_ms")
    val got = Sessions.sessionStats(ev, "user_id", "ts_ms", "event_id", gapMs = 100L)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got === Array(
      (1L, 0L, 3L, 10L, 12L, 150L),
      (1L, 1L, 2L, 13L, 14L, 50L),
      (2L, 0L, 2L, 20L, 21L, 0L),
      (3L, 0L, 2L, 30L, 31L, 100L)))
  }

  private def naiveSessions(events: Seq[(Long, Long, Long)], gap: Long): Seq[(Long, Long, Long)] = {
    // (user, session_idx, n_events) by single-threaded fold in (ts, id) order
    events.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var idx = -1L
      var prev = Long.MinValue
      val assigned = sorted.map { case (_, _, ts) =>
        if (prev == Long.MinValue || ts - prev > gap) idx += 1
        prev = ts
        idx
      }
      assigned.groupBy(identity).toSeq.map { case (i, g) => (user, i, g.size.toLong) }
    }.sortBy(t => (t._1, t._2))
  }

  test("differential: random streams match the single-threaded fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 5) {
      val events = (0 until 400).map { i =>
        (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(2000).toLong)
      }
      val gap = 50L + rnd.nextInt(200)
      val got = Sessions.sessionStats(events.toDF("user_id", "event_id", "ts_ms"),
          "user_id", "ts_ms", "event_id", gapMs = gap)
        .orderBy("user_id", "session_idx")
        .select("user_id", "session_idx", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === naiveSessions(events, gap), s"trial $trial gap=$gap")
    }
  }

  test("session_window parity: same session count and sizes per entity") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val events = (0 until 300).map { i =>
      (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(500).toLong * 1000L)
    }
    // session_window is end-exclusive (event at exactly prev+gap starts a
    // new session) while sessionize keeps it (strict >). ts values are
    // multiples of 1000ms, so a gap of 29999ms can never land on the
    // boundary and the two rules agree on every achievable gap.
    val gap = 29999L
    val df = events.toDF("user_id", "event_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val viaWindow = Sessions.sessionWindowAgg(df, "user_id", col("ts"), "29999 milliseconds")
      .select(col("user_id"), col("n_events"))
      .orderBy("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaBatch = Sessions.sessionStats(df, "user_id", "ts_ms", "event_id", gapMs = gap)
      .select(col("user_id"), col("n_events"))
      .orderBy("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaWindow === viaBatch)
  }

  test("transitionCounts matches a single-threaded bigram fold (randomized)") {
    val s = spark
    import s.implicits._
    val types = Array("view", "click", "purchase", "error")
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val events = (0 until 500).map { i =>
        (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(3000).toLong,
          types(rnd.nextInt(types.length)))
      }
      val gap = 100L + rnd.nextInt(300)
      val got = graft.streaming.Sessions.transitionCounts(
          events.toDF("user_id", "event_id", "ts_ms", "event_type"),
          "user_id", "ts_ms", "event_id", "event_type", gapMs = gap)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        evs.sortBy(e => (e._3, e._2)).sliding(2).collect {
          case Seq((_, _, t1, ty1), (_, _, t2, ty2)) if t2 - t1 <= gap => (ty1, ty2)
        }
      }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      assert(got === expected, s"trial $trial gap=$gap")
    }
  }

  test("funnelDepth matches a nested-min reference; strict-ts advancement (randomized)") {
    val s = spark
    import s.implicits._
    val types = Array("view", "click", "purchase", "error")
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 3) {
      val events = (0 until 400).map { i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(60).toLong, // coarse ts: forces ties
          types(rnd.nextInt(types.length)))
      }
      val got = graft.streaming.Sessions.funnelDepth(
          events.toDF("user_id", "ts_ms", "event_type"),
          "user_id", "ts_ms", "event_type", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expected = events.groupBy(_._1).map { case (u, evs) =>
        def minAfter(t: String, after: Option[Long]): Option[Long] = {
          val c = evs.filter(e => e._3 == t && after.forall(e._2 > _)).map(_._2)
          if (c.isEmpty) None else Some(c.min)
        }
        val v = minAfter("view", None)
        val c = v.flatMap(vt => minAfter("click", Some(vt)))
        val p = c.flatMap(ct => minAfter("purchase", Some(ct)))
        u -> (if (p.isDefined) 3 else if (c.isDefined) 2 else if (v.isDefined) 1 else 0)
      }
      assert(got === expected, s"trial $trial")
    }
  }

  test("streaming: session_window closes sessions once the watermark passes the gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val stream = input.toDS().toDF("user_id", "event_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 seconds")
    val query = Sessions.sessionWindowAgg(stream, "user_id", col("ts"), "5 seconds")
      .select("user_id", "n_events")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_sess").toString)
      .start()
    try {
      // user 1: two events 2s apart (one session); user 2: one event
      input.addData((1L, 1L, 1000L), (1L, 2L, 3000L), (2L, 3L, 2000L))
      query.processAllAvailable()
      // watermark jumps to 100000-10000=90000ms: both early sessions close
      input.addData((1L, 4L, 100000L))
      query.processAllAvailable()
      // push the watermark past 100000+gap so user 1's second session closes
      input.addData((1L, 5L, 300000L))
      query.processAllAvailable()
      val emitted = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the session at ts=300000 is still open (nothing advanced the
      // watermark past it), so exactly three closed sessions are emitted —
      // the same sessions the batch rule finds on the closed prefix
      assert(emitted === Set((1L, 2L), (2L, 1L), (1L, 1L)))
    } finally query.stop()
  }

  test("retentionCohorts: triangle counts distinct users per (cohort, offset)") {
    val s = spark
    import s.implicits._
    // period = 10ms. user 1: first p0, active p0,p1,p3; user 2: first p0,
    // active p0 twice (dedup!); user 3: first p1, active p1,p2
    val ev = Seq(
      (1L, 1L), (1L, 12L), (1L, 35L),
      (2L, 3L), (2L, 7L),
      (3L, 11L), (3L, 25L))
      .toDF("user_id", "ts_ms")
    val got = Sessions.retentionCohorts(ev, "user_id", "ts_ms", periodMs = 10L)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (0L, 0L, 2L),   // users 1 and 2 in week 0
      (0L, 1L, 1L),   // user 1 back in week 1
      (0L, 3L, 1L),   // user 1 back in week 3
      (1L, 0L, 1L),   // user 3's cohort
      (1L, 1L, 1L)))  // user 3 back one period later
  }

  test("retentionCohorts: null-ts activity rows survive the single-pass " +
       "rewrite (parity with the former distinct-then-join formulation)") {
    val s = spark
    import s.implicits._
    // user 1 has a real cohort plus one null-ts event -> a (cohort, null)
    // activity row (offset null); user 2 is all-null -> (null, null)
    val ev: Seq[(Long, java.lang.Long)] = Seq(
      (1L, java.lang.Long.valueOf(1L)), (1L, java.lang.Long.valueOf(12L)),
      (1L, null), (2L, null))
    val got = Sessions.retentionCohorts(ev.toDF("user_id", "ts_ms"),
        "user_id", "ts_ms", periodMs = 10L)
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2))).toSet
    assert(got === Set[(Any, Any, Long)](
      (0L, 0L, 1L), (0L, 1L, 1L), // user 1's real triangle
      (0L, null, 1L),             // user 1's null-period activity row
      (null, null, 1L)))          // user 2: null cohort, null period
  }

  test("funnelDepth: repeated stage types advance correctly " +
       "(strictly-later same-type events, randomized vs nested-min)") {
    val s = spark
    import s.implicits._
    val types = Array("view", "click")
    val rnd = new scala.util.Random(53)
    val stages = Seq("view", "view", "click")
    val events = (0 until 300).map { _ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(2)))
    }
    val got = graft.streaming.Sessions.funnelDepth(
        events.toDF("user_id", "ts_ms", "event_type"),
        "user_id", "ts_ms", "event_type", stages)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      def minAfter(t: String, after: Option[Long]): Option[Long] = {
        val c = evs.filter(e => e._3 == t && after.forall(e._2 > _)).map(_._2)
        if (c.isEmpty) None else Some(c.min)
      }
      var reach: Option[Long] = None
      var depth = 0
      var advanced = true
      for (st <- stages if advanced) {
        minAfter(st, if (depth == 0) None else reach) match {
          case Some(t) => reach = Some(t); depth += 1
          case None => advanced = false
        }
      }
      u -> depth
    }
    assert(got === expected)
  }

  test("rollingCounts: trailing RANGE frame, simultaneous events symmetric") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: window 100 — events at 0, 50, 150 (drops t=0), 300 (alone)
      (10L, 1L, 0L, "view"), (11L, 1L, 50L, "click"),
      (12L, 1L, 150L, "click"), (13L, 1L, 300L, "view"),
      // user 2: two simultaneous events — each sees both (value-bounded)
      (20L, 2L, 500L, "click"), (21L, 2L, 500L, "view"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = Sessions.rollingCounts(ev, "user_id", "ts_ms",
        "event_type", "click", windowMs = 100L)
      .select("event_id", "n_window", "n_match_window")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      10L -> ((1L, 0L)), 11L -> ((2L, 1L)),
      12L -> ((2L, 2L)),  // t=150 sees t=50 and itself, both clicks
      13L -> ((1L, 0L)),
      20L -> ((2L, 1L)), 21L -> ((2L, 1L))))
  }
}
