package graft.spark

import graft.resolve.{ChangeRow, ResolveEngine}
import graft.streaming.{Databus, Materializer, Subscription}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY §2.9): materializer changelog + tombstones +
  * redundant suppression, fanout on a stream, consolidation per micro-batch.
  * Scenarios mirror the reference's ConsolidationTest / RedundantDeltaTest /
  * DefaultFanoutTest shapes, driven through MemoryStream. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def change(key: String, ms: Long, delta: String, tags: Seq[String] = Seq.empty) =
    ChangeRow("t", key, ms, 0L, "n", delta, tags)

  test("materializer emits changelog with tombstones and suppresses redundant batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val query = Materializer.materialize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("mat_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mat").toString)
      .start()

    try {
      // batch 1: create two docs
      input.addData(
        change("k1", 1000, """{"name":"Bob","rating":3}"""),
        change("k2", 1000, """{"x":1}"""))
      query.processAllAvailable()
      val out1 = spark.table("mat_out").collect()
      assert(out1.length === 2)

      // batch 2: update k1, redundant write to k2 => only k1 emitted
      input.addData(
        change("k1", 2000, """{..,"rating":4}"""),
        change("k2", 2000, """{"x":1}"""))
      query.processAllAvailable()
      val out2 = spark.table("mat_out").collect()
      assert(out2.length === 3)
      val k1v2 = out2.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(k1v2.getAs[Long]("version") === 2)
      assert(k1v2.getAs[String]("body") === """{"name":"Bob","rating":4}""")

      // batch 3: delete k1 => tombstone row
      input.addData(change("k1", 3000, "~"))
      query.processAllAvailable()
      val out3 = spark.table("mat_out").collect()
      val tomb = out3.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(tomb.getAs[Boolean]("deleted") && tomb.getAs[Long]("version") === 3)

      // batch 4: resurrect k1; k2 stays silent
      input.addData(change("k1", 4000, """{..,"state":"APPROVED"}"""))
      query.processAllAvailable()
      val out4 = spark.table("mat_out").collect()
      val res = out4.filter(r => r.getAs[String]("id") == "k1")
        .maxBy(r => r.getAs[Long]("version"))
      assert(!res.getAs[Boolean]("deleted"))
      assert(res.getAs[String]("body") === """{"state":"APPROVED"}""")
      assert(out4.count(r => r.getAs[String]("id") == "k2") === 1) // never re-emitted
    } finally query.stop()
  }

  test("batch and streaming folds agree under supplementary-plane tie-breaks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // full cross product of colliding (ms, seq) pairs × node ids straddling
    // the UTF-8/UTF-16 order divergence: the batch fold tie-breaks on the
    // node via Tungsten's UTF-8 sort, the streaming fold via
    // Resolver.Utf8Order — they MUST apply equal-(ms,seq) deltas in the
    // same order or content AND chained signatures diverge
    val nodes = Seq("", "😀", "n1", "￿", "zz")
    val tags = Seq("", "😀", "a")
    val log = (for {
      key <- Seq("k1", "k2", "k3")
      ms <- Seq(1000L, 1100L)
      seq <- Seq(1L, 2L)
      (node, ni) <- nodes.zipWithIndex
    } yield {
      val i = s"$key$ms$seq$ni".hashCode
      graft.resolve.ChangeRow("t", key, ms, seq, node,
        s"""{..,"v":$i}""", Seq(tags(math.floorMod(i, tags.size))))
    }).toIndexedSeq
    val batch = ResolveEngine.resolve(log.toDF()).collect()
      .map(d => d.id -> (d.version, d.body, d.signature, d.last_tags)).toMap

    val input = MemoryStream[ChangeRow]
    val query = Materializer.materialize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("fold_parity_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_parity").toString)
      .start()
    try {
      input.addData(log) // one trigger: the whole log sorts inside the fold
      query.processAllAvailable()
      val streamed = spark.table("fold_parity_out").collect()
        .groupBy(_.getAs[String]("id"))
        .map { case (id, rows) =>
          val last = rows.maxBy(_.getAs[Long]("version"))
          id -> (last.getAs[Long]("version"), last.getAs[String]("body"),
            last.getAs[String]("signature"), last.getAs[Seq[String]]("last_tags"))
        }
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (id, got) =>
        assert(got === batch(id), s"fold divergence on $id")
      }
    } finally query.stop()
  }

  test("watermark-ordered materializer folds cross-batch late changes in changeId order") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val query = Materializer.materializeOrdered(input.toDS(), latenessMs = 5000)
      .writeStream.outputMode("append")
      .format("memory").queryName("mat_ordered_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mat_ord").toString)
      .start()

    try {
      // the literal at ms=10000 arrives FIRST; the merge at ms=7000 arrives
      // in a later micro-batch. changeId order folds 7000 before 10000, so
      // the literal erases the rating — arrival-order folding would not.
      input.addData(change("k1", 10000, """{"name":"Bob"}"""))
      query.processAllAvailable()
      input.addData(
        change("k1", 7000, """{..,"rating":4}"""),
        change("k1", 20000, """{..,"state":"APPROVED"}"""))
      query.processAllAvailable()
      // advance the watermark past ms=20000 so it commits
      input.addData(change("k1", 30000, """{..,"z":1}"""))
      query.processAllAvailable()

      val rows = spark.table("mat_ordered_out")
        .orderBy(col("version")).collect()
      assert(rows.nonEmpty)
      val last = rows.last
      // batch-fold parity on the committed prefix (7000, 10000, 20000)
      val batch = ResolveEngine.resolve(Seq(
        change("k1", 7000, """{..,"rating":4}"""),
        change("k1", 10000, """{"name":"Bob"}"""),
        change("k1", 20000, """{..,"state":"APPROVED"}""")).toDF())
        .collect().head
      assert(last.getAs[Long]("version") === batch.version)
      assert(last.getAs[String]("body") === batch.body)
      assert(last.getAs[String]("signature") === batch.signature)
      assert(!batch.body.contains("rating")) // the literal erased it
    } finally query.stop()
  }

  test("materializeOrdered drop contract: a change at or below the watermark " +
      "is filtered by the engine before the fold (documented in Materializer)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val query = Materializer.materializeOrdered(input.toDS(), latenessMs = 5000)
      .writeStream.outputMode("append")
      .format("memory").queryName("mat_drop_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mat_drop").toString)
      .start()
    try {
      input.addData(change("k1", 10000, """{"v":"a"}"""))
      query.processAllAvailable() // wm -> 5000
      input.addData(change("k1", 20000, """{..,"late":"no"}"""))
      query.processAllAvailable() // wm -> 15000
      // 12000 <= wm 15000: beyond lateness — FlatMapGroupsWithStateExec's
      // EventTimeTimeout late-data filter drops it before the operator.
      // This pins the TRUE contract (no silent arrival-order fold).
      input.addData(change("k1", 12000, """{..,"mid":true}"""))
      query.processAllAvailable()
      input.addData(change("k2", 100000, """{"p":1}"""))
      query.processAllAvailable()
      input.addData(change("k2", 110000, """{"p":2}"""))
      query.processAllAvailable()
      val last = spark.table("mat_drop_out")
        .filter(col("id") === "k1").orderBy(col("version")).collect().last
      assert(last.getAs[Long]("version") === 2L) // 10000 + 20000, no 12000
      assert(last.getAs[String]("body") === """{"late":"no","v":"a"}""")
    } finally query.stop()
  }

  test("streaming fanout routes events to matching subscription channels") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeRow]
    val subs = Seq(
      Subscription("tagged", """{..,"~tags":contains("etl")}"""),
      Subscription("key_k1", """intrinsic("~id":"k1")"""))
    val query = Databus.fanout(input.toDF(), subs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fanout_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_fan").toString)
      .start()
    try {
      input.addData(
        change("k1", 1000, "{}", Seq("etl")),
        change("k2", 1000, "{}", Seq("web")),
        change("k3", 1000, "{}", Seq("etl", "web")))
      query.processAllAvailable()
      val rows = spark.table("fanout_out")
        .select("subscription", "key").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows === Set(("tagged", "k1"), ("tagged", "k3"), ("key_k1", "k1")))
    } finally query.stop()
  }

  test("PROPERTY: fanout matches the driver-side subscription model incl null tags") {
    import graft.condition.{ConditionEvaluator, Conditions, IntrinsicsView}
    import graft.json._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val types = Seq("purchase", "view", "error", "signup")
    val rows = (1 to 60).map { i =>
      val tags: Seq[String] =
        if (i % 7 == 0) null
        else if (i % 5 == 0) Seq.empty
        else Seq(types(rnd.nextInt(types.size)), types(rnd.nextInt(types.size))).distinct
      (if (i % 2 == 0) "events" else "orders", s"k$i", 1000L * i, i.toLong, "n", tags)
    }
    val events = rows.toDF("table", "key", "ms", "seq", "node", "tags")
    val subs = Seq(
      Subscription("s1", """{..,"~tags":containsAny("error","view")}"""),
      Subscription("s2", """not({..,"~tags":containsAny("error")})"""),
      Subscription("s3", """intrinsic("~table":like("ev*"))"""),
      Subscription("s4", """and(intrinsic("~table":"orders"),not({..,"~tags":containsAll("purchase","view")}))"""),
      Subscription("s5", """or({..,"~tags":containsOnly("view")},intrinsic("~id":like("k1*")))"""),
      Subscription("s6", "not(intrinsic(\"~table\":\"orders\"))"),
      Subscription("s7", "alwaysTrue()"))
    val out = Databus.fanout(events, subs)
      .select("subscription", "key").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // driver-side model: the reference evaluator over the match JSON
    val expected = (for {
      sub <- subs
      (table, key, _, _, _, tags) <- rows
      json = Databus.eventMatchJson(JObj(Map.empty),
        if (tags == null) Seq.empty else tags)
      intr = IntrinsicsView(key, table, null, deleted = false, null, null, null, null)
      if ConditionEvaluator.eval(Conditions.fromString(sub.condition), json, intr)
    } yield (sub.name, key)).toSet
    assert(out === expected)
    // and every subscription delivered something in this fixture
    assert(subs.map(_.name).toSet === out.map(_._1).toSet)
  }

  test("fanout match semantics: absent ~tags, ~placement intrinsic, unevaluable conditions (SubscriptionEvaluatorTest parity)") {
    val s = spark
    import s.implicits._
    // k_tagged carries tags; k_untagged has an EMPTY tag set; k_null a null column
    val events = Seq(
      ("table1", "k_tagged", 1000L, 1L, "n", Seq("ignore", "ETL"), "app_global:ugc"),
      ("table1", "k_untagged", 2000L, 2L, "n", Seq.empty[String], "app_global:ugc"),
      ("table1", "k_null", 3000L, 3L, "n", null.asInstanceOf[Seq[String]], "ugc_other"))
      .toDF("table", "key", "ms", "seq", "node", "tags", "placement")
    val subs = Seq(
      // SubscriptionEvaluatorTest.testSubscriptionEvaluator: skip-ignore vs get-ignore
      Subscription("skip_ignore", """not({..,"~tags":containsAny("ignore")})"""),
      Subscription("get_ignore", """{..,"~tags":containsAny("ignore")}"""),
      // ~tags is ABSENT (not []) for untagged events
      Subscription("tags_defined", """{..,"~tags":is(defined)}"""),
      Subscription("tags_empty", """{..,"~tags":[]}"""),
      // ~placement is one of the three fanout intrinsics
      Subscription("ugc_placement", """intrinsic("~placement":"app_global:ugc")"""),
      // ~version is unsupported in conditions: evaluation throws, which at
      // fanout means NO MATCH, not a failed pass
      Subscription("broken", """intrinsic("~version":5)"""),
      // COMPOSITE conditions on the absent-capable ~tags field: the
      // mayBeUndefined flag must survive not/and/or/in recursion or the
      // native path diverges from the parity evaluator on untagged events
      Subscription("not_undef", """not({..,"~tags":is(undefined)})"""),
      Subscription("tags_not_null", """{..,"~tags":not(is(null))}"""))
    def routed(unionMax: Int): Set[(String, String)] =
      Databus.fanout(events, subs, unionPathMaxSubs = unionMax,
          placementCol = Some("placement"))
        .select("subscription", "key").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(
      "skip_ignore" -> "k_untagged", "skip_ignore" -> "k_null",
      "get_ignore" -> "k_tagged",
      "tags_defined" -> "k_tagged",
      "ugc_placement" -> "k_tagged", "ugc_placement" -> "k_untagged",
      // not(is(undefined)): tagged only (evaluator: JUndefined -> true -> not false)
      "not_undef" -> "k_tagged",
      // not(is(null)): EVERY event (is(null) is false for both JUndefined
      // and a real tag array — ~tags can never hold a present null)
      "tags_not_null" -> "k_tagged", "tags_not_null" -> "k_untagged",
      "tags_not_null" -> "k_null")
    assert(routed(unionMax = 16) === expected, "union path")
    assert(routed(unionMax = 1) === expected, "single-pass path")
  }

  test("fanout robustness: empty subscription list and corrupt attrs JSON") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("t1", "k_ok", 1000L, 1L, "n", Seq("ETL"), """{"type":"review"}"""),
      ("t1", "k_bad", 2000L, 2L, "n", Seq("ETL"), """{"type": <corrupt"""))
      .toDF("table", "key", "ms", "seq", "node", "tags", "attrs")
    // every subscription expired -> empty list must yield an empty frame
    // with the fanout schema, not an empty.reduce crash
    val none = Databus.fanout(events, Seq.empty)
    assert(none.columns.contains("subscription") && none.count() === 0L)
    // corrupt attrs: attribute conditions see no fields (no match), but the
    // event still reaches tag/alwaysTrue subscriptions and the task lives
    val subs = Seq(
      Subscription("all", "alwaysTrue()"),
      Subscription("reviews", """{..,"type":"review"}"""))
    def routed(unionMax: Int): Set[(String, String)] =
      Databus.fanout(events, subs, attrsCol = Some("attrs"),
          unionPathMaxSubs = unionMax)
        .select("subscription", "key").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(
      "all" -> "k_ok", "all" -> "k_bad", "reviews" -> "k_ok")
    assert(routed(unionMax = 16) === expected, "union path")
    assert(routed(unionMax = 1) === expected, "single-pass path")
  }

  test("cross-DC replication routing: non-local DCs only, murmur3 partition parity, no event shuffle (DefaultFanout.java:246-258)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("t_global", "alpha", 1000L, 1L, "n", Seq("x")),
      ("t_global", "beta", 2000L, 2L, "n", Seq("x")),
      ("t_local", "alpha", 3000L, 3L, "n", Seq("x")),
      ("t_unknown", "gamma", 4000L, 4L, "n", Seq("x")))
      .toDF("table", "key", "ms", "seq", "node", "tags")
    // t_global replicates to all three DCs; t_local lives only here;
    // t_unknown is not in the topology (no replicas -> no outbound copies)
    val topo = Seq(
      ("t_global", "us-east"), ("t_global", "eu-west"), ("t_global", "ap-south"),
      ("t_local", "us-east"))
      .toDF("table", "datacenter")
    val out = Databus.replicationFanout(events, topo, currentDc = "us-east",
      outboundPartitions = 8)
    val got = out.select("table", "key", "channel").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    def ch(dc: String, key: String) =
      Databus.replicationChannel(dc, Databus.partitionFor(key, 8))
    val expected = Set(
      ("t_global", "alpha", ch("eu-west", "alpha")),
      ("t_global", "alpha", ch("ap-south", "alpha")),
      ("t_global", "beta", ch("eu-west", "beta")),
      ("t_global", "beta", ch("ap-south", "beta")))
    assert(got === expected)
    // channel partition is in range and matches the scalar selector
    out.select("key", "partition").collect().foreach { r =>
      val p = r.getInt(1)
      assert(p >= 0 && p < 8 && p === Databus.partitionFor(r.getString(0), 8))
    }
    // the event side is scanned once and never shuffles: the only exchange
    // in the plan is the broadcast of the (tiny) topology
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")
    // inbound master-channel partitioning (DefaultDatabus.java:400-407)
    val master = Databus.masterChannels(events, masterPartitions = 4)
      .select("key", "channel").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(master === events.select("key").collect().map(_.getString(0)).toSet
      .map((k: String) => (k, Databus.masterChannel(Databus.partitionFor(k, 4)))))
  }

  test("subscription lifecycle: TTL expiry, renewal, event TTL in fanout") {
    import graft.streaming.Databus.{SubscriptionRecord => SR}
    val s = spark
    import s.implicits._
    var reg = Seq.empty[SR]
    reg = Databus.subscribe(reg, "a", "alwaysTrue()", nowMs = 0, subscriptionTtlMs = 1000, eventTtlMs = 500)
    reg = Databus.subscribe(reg, "b", "alwaysTrue()", nowMs = 0, subscriptionTtlMs = 2000, eventTtlMs = 5000)
    // idempotent re-subscribe replaces
    reg = Databus.subscribe(reg, "a", "alwaysTrue()", nowMs = 100, subscriptionTtlMs = 1000, eventTtlMs = 500)
    assert(reg.size === 2)
    assert(Databus.activeSubscriptions(reg, nowMs = 1050).map(_.name) === Seq("b", "a"))
    // at t=1200, a (expires 1100) is gone; renewal would have kept it
    assert(Databus.activeSubscriptions(reg, nowMs = 1200).map(_.name) === Seq("b"))
    val renewed = Databus.renew(reg, "a", nowMs = 1000, subscriptionTtlMs = 1000)
    assert(Databus.activeSubscriptions(renewed, nowMs = 1200).map(_.name).toSet === Set("a", "b"))
    assert(Databus.unsubscribe(reg, "b").map(_.name) === Seq("a"))

    // event TTL: at now=1000, sub a (ttl 500) sees only events >= 500
    val events = Seq(
      ("t", "k1", 100L, 1L, "n", Seq.empty[String]),
      ("t", "k2", 600L, 2L, "n", Seq.empty[String]),
      ("t", "k3", 990L, 3L, "n", Seq.empty[String]))
      .toDF("table", "key", "ms", "seq", "node", "tags")
    val out = Databus.fanoutWithTtl(events, reg, nowMs = 1000)
      .groupBy("subscription").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") === 2) // k2, k3 within 500ms ttl
    assert(out("b") === 3) // all within 5000ms ttl
    // expired registry fans out nothing, with the output schema intact
    val none = Databus.fanoutWithTtl(events, reg, nowMs = 10000)
    assert(none.count() === 0 && none.columns.contains("subscription"))
  }

  test("streaming dedup queue drops cross-batch duplicates within the watermark") {
    import graft.streaming.Queues
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDS().toDF("msg_id", "dedup_key", "payload")
      .withColumn("eventTime", timestamp_millis(col("msg_id") * 1000))
    val query = Queues.streamingDedup(stream, "dedup_key", "eventTime", "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("qdedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_qd").toString)
      .start()
    try {
      input.addData((1L, "a", "m1"), (2L, "b", "m2"), (3L, "a", "m3"))
      query.processAllAvailable()
      // duplicate of "a" in a LATER batch, still within the watermark
      input.addData((4L, "a", "m4"), (5L, "c", "m5"))
      query.processAllAvailable()
      val keys = spark.table("qdedup_out").select("dedup_key", "payload").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(keys.keySet === Set("a", "b", "c"))
      assert(keys("a") === "m1") // first occurrence wins, cross-batch dup dropped
    } finally query.stop()
  }

  test("streaming curation: quality/repetition/langid gates + watermark dedup run in one streaming pipeline") {
    import graft.pipeline.{Dedup, TextAnalysis}
    import graft.streaming.Queues
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and then the " +
      "dog wanders off to sleep in the shade of a tall tree"
    val spammy = ("buy now. " * 20).trim // repetition gate kills it
    val input = MemoryStream[(Long, String)]
    // the batch curation gates are stateless column expressions, so the
    // SAME exprs drop into readStream; dedup is the watermark-state variant
    val stream = input.toDS().toDF("doc_id", "text")
      .withColumn("eventTime", timestamp_millis(col("doc_id") * 1000))
      .withColumn("text_hash", md5(col("text")))
      .where(TextAnalysis.qualityOk(col("text")) &&
        TextAnalysis.repetitionOk(col("text")) &&
        TextAnalysis.langId(col("text")) === "en")
    val query = Queues.streamingDedup(stream, "text_hash", "eventTime", "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("curation_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_cur").toString)
      .start()
    try {
      input.addData((1L, good), (2L, spammy), (3L, "kurz")) // 3: too few tokens
      query.processAllAvailable()
      input.addData((4L, good), (5L, good + " entirely new ending here"))
      query.processAllAvailable()
      val kept = spark.table("curation_stream_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // 1 passes; 2 fails repetition; 3 fails quality; 4 is an exact dup of
      // 1 across batches (watermark dedup); 5 passes as distinct content
      assert(kept === Set(1L, 5L))
      // sanity: the same gate set in batch agrees with the streamed verdicts
      val batchKept = Seq((1L, good), (2L, spammy), (3L, "kurz"), (4L, good),
          (5L, good + " entirely new ending here"))
        .toDF("doc_id", "text")
        .where(TextAnalysis.qualityOk(col("text")) &&
          TextAnalysis.repetitionOk(col("text")) &&
          TextAnalysis.langId(col("text")) === "en")
      val batchDeduped = Dedup.dropExactDuplicates(batchKept, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchDeduped === kept)
    } finally query.stop()
  }

  test("streaming media: decode/resize/window run unchanged under readStream") {
    import graft.pipeline.{MediaRow, Multimodal}
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real BMP/WAV payloads through the SAME stateless codec path the
    // batch pipeline uses; verdicts must match the batch run exactly
    val docs = (0L until 30L).map(i => (i, s"stream doc $i " + ("x" * i.toInt)))
    val media = Multimodal.syntheticMedia(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().toSeq
    val input = MemoryStream[MediaRow]
    val feats = Multimodal.extractFeatures(
      Multimodal.resizeMedia(input.toDS(), maxDim = 8)).toDF()
      .select("media_id", "mime", "width", "height", "duration_ms", "n_bytes")
    val query = feats.writeStream.outputMode("append")
      .format("memory").queryName("media_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_media").toString)
      .start()
    try {
      input.addData(media.take(15): _*)
      query.processAllAvailable()
      input.addData(media.drop(15): _*)
      query.processAllAvailable()
      val streamed = spark.table("media_stream_out").collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getLong(5)))).toMap
      val batch = Multimodal.extractFeatures(
          Multimodal.resizeMedia(media.toDS(), maxDim = 8)).toDF()
        .select("media_id", "mime", "width", "height", "duration_ms", "n_bytes")
        .collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getLong(5)))).toMap
      assert(streamed === batch)
      assert(streamed.values.forall { case (mime, w, h, _, _) =>
        mime != "image/bmp" || (w <= 8 && h <= 8) })
    } finally query.stop()
  }

  test("ref resolution classifies pending refs into the retry channel") {
    import graft.streaming.RefResolver
    val s = spark
    import s.implicits._
    val changes = Seq(
      change("k1", 1000, """{"x":1}"""),
      change("k1", 2000, """{..,"y":2}"""),
      change("k2", 1000, "~")).toDF()
    val refs = Seq(
      ("t", "k1", 2000L, 0L, "n"),   // resolved
      ("t", "k2", 1000L, 0L, "n"),   // resolved tombstone
      ("t", "k1", 9000L, 0L, "n"),   // ref ahead of visible write => pending
      ("t", "k9", 1000L, 0L, "n"))   // unknown coordinate => pending
      .toDF("table", "key", "ms", "seq", "node")
    val out = RefResolver.resolveRefs(refs, changes)
    val statuses = out.collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("ms")) -> r.getAs[String]("status")).toMap
    assert(statuses(("k1", 2000L)) === "resolved")
    assert(statuses(("k2", 1000L)) === "resolved")
    assert(statuses(("k1", 9000L)) === "pending")
    assert(statuses(("k9", 1000L)) === "pending")
    val resolved = out.where($"status" === "resolved" && $"key" === "k1").collect()(0)
    assert(resolved.getAs[String]("body") === """{"x":1,"y":2}""")
    val tomb = out.where($"status" === "resolved" && $"key" === "k2").collect()(0)
    assert(tomb.getAs[Boolean]("deleted"))
    assert(RefResolver.retryChannel(out).count() === 2)
  }

  test("extensions: optimizer rule folds constant conditions; SQL functions registered") {
    import graft.engine.{GraftExtensions, GraftFunctions, SimplifyEmoConditions}
    val s = spark
    import s.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("""{"a":1}"""), ("""{"a":2}""")).toDF("body")
    df.createOrReplaceTempView("docs_v")
    // SQL surface: condition DSL callable from spark.sql
    val n = spark.sql("""SELECT count(*) FROM docs_v WHERE emo_cond(body, '{..,"a":ge(2)}')""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 1)
    // the rule folds or(alwaysTrue(), ...) to literal true
    val plan = df.where(graft.engine.expressions.emoCondEval(
      """or(alwaysTrue(),{..,"a":1})""", $"body")).queryExecution.analyzed
    val folded = SimplifyEmoConditions(plan)
    assert(!folded.toString.toLowerCase.contains("emocondeval"))
    // and drops subsumed union branches inside surviving conditions
    val plan2 = df.where(graft.engine.expressions.emoCondEval(
      """or({..,"a":1},{..,"a":in(1,2)})""", $"body")).queryExecution.analyzed
    val simplified2 = SimplifyEmoConditions(plan2)
    assert(simplified2.toString.contains("""in(1,2)"""))
    assert(!simplified2.toString.contains("or("))
    // extension class wires the rule without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // hash parity through SQL
    val h = spark.sql("SELECT emo_hash32('abc')").collect()(0).getInt(0)
    assert(h === graft.json.Hashes.murmur3_32("abc"))
    // pipeline operators through SQL: jaccard of shingle sets, language id,
    // quality gate, minhash signature length
    val row = spark.sql(
      """SELECT emo_jaccard(emo_shingles('a b c d', 2), emo_shingles('a b c e', 2)) AS j,
        |       emo_langid('the cat of the hat is the best') AS lang,
        |       emo_quality_ok('short', 2) AS q,
        |       size(emo_minhash('a b c d e f', 2, 16)) AS k""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 0.5) < 1e-9) // {ab,bc,cd} vs {ab,bc,ce}: 2 of 4
    assert(row.getString(1) === "en")
    assert(row.getBoolean(2) === false) // mean token len fine but only 1 token... minTokens=2 fails
    assert(row.getInt(3) === 16)
    // repetition surface through SQL: stats struct + configurable gate
    val rep = spark.sql(
      """SELECT emo_repetition_stats('spam spam spam spam').top2_cnt AS c,
        |       emo_repetition_ok('spam spam spam spam') AS bad,
        |       emo_repetition_ok('spam spam spam spam', 2.0, 2.0, 1.0) AS lax""".stripMargin)
      .collect()(0)
    assert(rep.getLong(0) === 3L)
    assert(rep.getBoolean(1) === false) // "spam spam" x3 covers > 20% of chars
    // overlapping occurrences can push gram mass past 1.0 (3 x 9 chars over
    // a 19-char string = 1.42), so "lifted" means 2.0 here
    assert(rep.getBoolean(2) === true)
    // PII surface through SQL (raw catalyst nodes, RuntimeReplaceable-lowered)
    val gate = spark.sql(
      """SELECT emo_pii_free('mail bob@x.io') AS pii,
        |       emo_pii_free('plain words only') AS clean,
        |       emo_scrub('see https://a.b now') AS scrubbed""".stripMargin)
      .collect()(0)
    assert(gate.getBoolean(0) === false)
    assert(gate.getBoolean(1) === true)
    assert(gate.getString(2) === "see <URL> now")
    // URL + gram surfaces through SQL; the registry folds the SAME step
    // lists as the Column API, asserted per messy fixture
    import graft.pipeline.{Dsir, Urls}
    val messy = Seq(" HTTP://WWW.Shop.Example.COM:80/Item/?utm_source=m&id=7#top ",
      "https://e.com/p?href=a", "https://a.b.example.co:443/x//", "plain text")
    val sqlVsColumn = messy.toDF("u")
      .selectExpr("emo_url_normalize(u) AS sqln", "u")
      .select(col("sqln"), Urls.normalize(col("u")).as("coln"),
        expr("emo_url_host(emo_url_normalize(u))").as("sqlh"),
        Urls.host(Urls.normalize(col("u"))).as("colh"),
        expr("emo_url_domain(emo_url_normalize(u))").as("sqld"),
        Urls.registeredDomain(Urls.normalize(col("u"))).as("cold"))
      .collect()
    sqlVsColumn.foreach { r =>
      assert(r.getString(0) === r.getString(1), "normalize parity")
      assert(r.getString(2) === r.getString(3), "host parity")
      assert(r.getString(4) === r.getString(5), "domain parity")
    }
    val grams = Seq("the cat sat on the mat").toDF("t")
      .select(expr("emo_gram_hashes(t)").as("sqlg"), Dsir.gramHashes(col("t")).as("colg"),
        expr("emo_gram_buckets(t, 64)").as("sqlb"),
        Dsir.gramBuckets(col("t"), 64).as("colb"))
      .collect()(0)
    assert(grams.getSeq[Long](0) === grams.getSeq[Long](1))
    assert(grams.getSeq[Int](2) === grams.getSeq[Int](3))
  }

  test("table purge control events tombstone every document; lag monitor sees progress") {
    import graft.engine.{EmoSession, EventLog}
    import graft.resolve.{ChangeRow => CR, ResolveEngine}
    val s = spark
    import s.implicits._
    val changes = EventLog.changes(spark, "/root/testdata/sf0.001")
    val session = new EmoSession(spark, changes)
    val purge = session.purgeEvents("events", atMs = 9999999999999L)
    val purged = ResolveEngine.resolve(changes.unionByName(purge))
    assert(purged.collect().forall(_.deleted)) // every doc tombstoned

    // lag monitor on a live streaming query
    val monitor = new Databus.LagMonitor
    spark.streams.addListener(monitor)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CR]
    val q = input.toDF().writeStream.outputMode("append")
      .format("memory").queryName("lag_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_lag").toString)
      .start()
    try {
      input.addData(change("k1", 1000, "{}"), change("k2", 1000, "{}"))
      q.processAllAvailable()
      // progress events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (monitor.totalInputRows < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(monitor.batches >= 1 && monitor.totalInputRows >= 2)
    } finally {
      q.stop()
      spark.streams.removeListener(monitor)
    }
  }

  test("materializer folds compaction checkpoint rows like the batch engine") {
    import graft.resolve.Compactor
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = Seq(
      change("k1", 1000, """{"a":1}"""),
      change("k1", 2000, """{..,"b":2}""", Seq("t1")),
      change("k1", 3000, """{..,"a":5}"""),
      change("k2", 1000, """{"x":1}"""),
      change("k2", 2000, "~"))
    val compacted = Compactor.compact(log.toDF(), cutoffMs = 2500)
      .as[ChangeRow].collect().toSeq
    assert(compacted.exists(c => ResolveEngine.isCheckpoint(c.delta)))
    val tail = change("k1", 4000, """{..,"c":7}""")

    val input = MemoryStream[ChangeRow]
    val query = Materializer.materialize(input.toDS(), placement = "pl")
      .writeStream.outputMode("append")
      .format("memory").queryName("mat_ckpt_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_matc").toString)
      .start()
    try {
      input.addData(compacted: _*)
      query.processAllAvailable()
      input.addData(tail)
      query.processAllAvailable()
      val streamed = spark.table("mat_ckpt_out").collect()
        .groupBy(_.getAs[String]("id"))
        .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("version")) }
      val batch = ResolveEngine.resolve((log :+ tail).toDF(), "pl").collect()
        .map(d => d.id -> d).toMap
      // exact batch parity: content, version AND signature survive the
      // checkpoint restore in the streaming fold
      val k = "k1"
      assert(streamed(k).getAs[String]("body") === batch(k).body, s"body $k")
      assert(streamed(k).getAs[Long]("version") === batch(k).version, s"version $k")
      assert(streamed(k).getAs[String]("signature") === batch(k).signature, s"signature $k")
      assert(streamed(k).getAs[Boolean]("deleted") === batch(k).deleted, s"deleted $k")
      // k2 compacted to a tombstone checkpoint: restoring a tombstone over
      // empty state mutates nothing, so the changelog (correctly) stays
      // silent — same suppression as a redundant delta
      assert(!streamed.contains("k2") && batch("k2").deleted)
    } finally query.stop()
  }

  test("legacy pre-marker checkpoint rows fail loudly in batch and streaming") {
    val s = spark
    import s.implicits._
    val legacy = ChangeRow("t", "k", 1000L, 0L, "compaction:3:100:900", """{"x":1}""", Seq.empty)
    val e1 = intercept[Exception] {
      ResolveEngine.resolve(Seq(legacy).toDF()).collect()
    }
    def rootMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString("|")
    assert(rootMessages(e1).contains("legacy compaction checkpoint"))
    val e2 = intercept[IllegalStateException] {
      Materializer.applyBatch("t", "k", Materializer.initialState, Seq(legacy))
    }
    assert(e2.getMessage.contains("legacy compaction checkpoint"))
    // a NON-numeric "compaction:"-prefixed producer node is an ordinary change
    val okNode = ChangeRow("t", "k", 1000L, 0L, "compaction:node-7", """{"x":1}""", Seq.empty)
    assert(ResolveEngine.resolve(Seq(okNode).toDF()).collect().head.version === 1L)
  }

  test("fanout at 500 subscriptions: one source scan, parity with model and union path") {
    import graft.condition.{ConditionEvaluator, Conditions, IntrinsicsView}
    import graft.json._
    val s = spark
    import s.implicits._
    val types = Seq("purchase", "view", "error", "signup")
    val rows = (1 to 200).map { i =>
      val tags: Seq[String] = if (i % 7 == 0) null else Seq(types(i % 4))
      (if (i % 2 == 0) "events" else "orders", s"k$i", 1000L * i, i.toLong, "n", tags)
    }
    val events = rows.toDF("table", "key", "ms", "seq", "node", "tags")
    val subs = (1 to 500).map { i =>
      val cond = i % 4 match {
        case 0 => s"""{..,"~tags":contains("${types(i % types.size)}")}"""
        case 1 => s"""intrinsic("~id":like("k${i % 10}*"))"""
        case 2 => """and(intrinsic("~table":"events"),{..,"~tags":containsAny("error","view")})"""
        case _ => s"""not({..,"~tags":contains("${types(i % types.size)}")})"""
      }
      Subscription(s"sub$i", cond)
    }
    val single = Databus.fanout(events, subs) // 500 > default threshold
    val planStr = single.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(planStr).size
    assert(scans === 1, s"expected ONE source scan at 500 subscriptions, got $scans")
    val got = single.select("subscription", "key").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // driver-side model truth
    val expected = (for {
      sub <- subs
      (table, key, _, _, _, tags) <- rows
      json = Databus.eventMatchJson(JObj(Map.empty),
        if (tags == null) Seq.empty else tags)
      intr = IntrinsicsView(key, table, null, deleted = false, null, null, null, null)
      if ConditionEvaluator.eval(sub.parsed, json, intr)
    } yield (sub.name, key)).toSet
    assert(got === expected)
    // both physical paths agree on a shared slice
    val slice = subs.take(24)
    val viaUnion = Databus.fanout(events, slice, unionPathMaxSubs = 100)
      .select("subscription", "key").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaSingle = Databus.fanout(events, slice, unionPathMaxSubs = 1)
      .select("subscription", "key").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaUnion === viaSingle)
  }

  test("fanoutWithTtl: single-pass path honors per-subscription event TTLs") {
    import graft.streaming.Databus.{SubscriptionRecord => SR}
    val s = spark
    import s.implicits._
    val reg = Seq(
      SR("short", "alwaysTrue()", subscriptionExpiresMs = 9999, eventTtlMs = 500),
      SR("long", "alwaysTrue()", subscriptionExpiresMs = 9999, eventTtlMs = 5000),
      SR("expired", "alwaysTrue()", subscriptionExpiresMs = 10, eventTtlMs = 5000))
    val events = Seq(
      ("t", "k1", 100L, 1L, "n", Seq.empty[String]),
      ("t", "k2", 600L, 2L, "n", Seq.empty[String]),
      ("t", "k3", 990L, 3L, "n", Seq.empty[String]))
      .toDF("table", "key", "ms", "seq", "node", "tags")
    def counts(unionMax: Int) =
      Databus.fanoutWithTtl(events, reg, nowMs = 1000, unionPathMaxSubs = unionMax)
        .groupBy("subscription").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSingle = counts(1)
    assert(viaSingle === Map("short" -> 2L, "long" -> 3L))
    assert(viaSingle === counts(100))
  }

  test("orphaned events: unknown tables retry within grace, drop after (DefaultFanoutTest parity)") {
    val s = spark
    import s.implicits._
    val t0 = 1000000L
    val events = Seq(
      ("known", "k1", t0),          // routable
      ("dropped", "k2", t0),        // orphan, fresh
      ("dropped", "k3", t0 - 60000L) // orphan, past grace
    ).toDF("table", "key", "ms")
    val catalog = Seq("known").toDF("table")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("key").collect().map(_.getString(0)).toSet

    val (routable, retry, drop) = graft.streaming.Databus.splitOrphans(
      events, catalog, nowMs = t0, graceMs = 30000L)
    assert(keys(routable) === Set("k1"))
    assert(keys(retry) === Set("k2"))
    assert(keys(drop) === Set("k3"))

    // 31s later the fresh orphan's grace has passed -> drop
    val (_, retry2, drop2) = graft.streaming.Databus.splitOrphans(
      events, catalog, nowMs = t0 + 31000L, graceMs = 30000L)
    assert(keys(retry2) === Set.empty[String])
    assert(keys(drop2) === Set("k2", "k3"))

    // the table appears in the catalog (delayed cache invalidation):
    // the retried event becomes routable
    val catalog2 = Seq("known", "dropped").toDF("table")
    val (routable3, retry3, _) = graft.streaming.Databus.splitOrphans(
      events, catalog2, nowMs = t0, graceMs = 30000L)
    assert(keys(routable3) === Set("k1", "k2", "k3"))
    assert(keys(retry3) === Set.empty[String])
  }

  test("databus move re-keys pending events without re-filtering; subscribe ANDs the default join filter") {
    import graft.streaming.Databus.{SubscriptionRecord => SR}
    val s = spark
    import s.implicits._
    // move: DefaultDatabusTest move semantics — events already fanned out to
    // 'from' go to 'to' verbatim, even where 'to''s condition would reject
    val events = Seq(
      ("t", "k1", 1000L, 1L, "n", Seq("purchase")),
      ("t", "k2", 2000L, 2L, "n", Seq("view")),
      ("t", "k3", 3000L, 3L, "n", Seq("purchase")))
      .toDF("table", "key", "ms", "seq", "node", "tags")
    val subs = Seq(
      Subscription("from_sub", "alwaysTrue()"),
      Subscription("to_sub", """{..,"~tags":contains("view")}"""))
    val channel = Databus.fanout(events, subs)
    val moved = Databus.move(channel, "from_sub", "to_sub")
    val byKey = moved.groupBy("subscription").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // to_sub now holds its own 1 matched event plus all 3 moved ones,
    // including the purchases its condition would reject; from_sub is empty
    assert(byKey === Map("to_sub" -> 4L))
    // future fanout is unaffected: the registry still filters per-condition
    val after = Databus.fanout(events, subs).groupBy("subscription").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === Map("from_sub" -> 3L, "to_sub" -> 1L))

    // defaultJoinFilter: AND-ed at subscribe; alwaysTrue user condition is
    // replaced; opt-out keeps the raw condition; alwaysTrue default is a no-op
    val default = Some("""not({..,"~tags":contains("internal")})""")
    var reg = Seq.empty[SR]
    reg = Databus.subscribe(reg, "u1", """{..,"~tags":contains("view")}""",
      0L, 1000L, 1000L, default)
    reg = Databus.subscribe(reg, "u2", "alwaysTrue()", 0L, 1000L, 1000L, default)
    reg = Databus.subscribe(reg, "u3", "alwaysTrue()", 0L, 1000L, 1000L, default,
      includeDefaultJoinFilter = false)
    reg = Databus.subscribe(reg, "u4", """{..,"~tags":contains("view")}""",
      0L, 1000L, 1000L, Some("alwaysTrue()"))
    def cond(n: String) = reg.find(_.name == n).get.condition
    assert(graft.condition.Conditions.fromString(cond("u1")) ===
      graft.condition.Conditions.and(Seq(
        graft.condition.Conditions.fromString("""{..,"~tags":contains("view")}"""),
        graft.condition.Conditions.fromString(default.get))))
    assert(graft.condition.Conditions.fromString(cond("u2")) ===
      graft.condition.Conditions.fromString(default.get))
    assert(cond("u3") === "alwaysTrue()")
    assert(cond("u4") === """{..,"~tags":contains("view")}""")
  }

  test("consolidation collapses a batch to one event per coordinate") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      change("k1", 1000, "a", Seq("t1")),
      change("k1", 2000, "b", Seq("t2")),
      change("k1", 3000, "c", Seq("t1")),
      change("k2", 1000, "z", Seq.empty)).toDF()
    val out = Databus.consolidate(batch, Seq("delta")).collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[String]("delta"), r.getAs[Seq[String]]("tags"), r.getAs[Long]("consolidated_count")))
      .toMap
    assert(out("k1") === (("c", Seq("t1", "t2"), 3L))) // max-changeId content, sorted tag union
    assert(out("k2") === (("z", Seq.empty, 1L)))
  }

  test("streaming crawl-cleaning: C4 gates, canary automaton and winnow prints run per micro-batch") {
    import graft.pipeline.{C4Rules, Decontaminate, Dedup}
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val goodLine = "a perfectly ordinary sentence with plenty of everyday words."
    val goodPage = Seq(goodLine, goodLine, goodLine).mkString("\n")
    val canary = "CANARY-GUID-0abc"
    val input = MemoryStream[(Long, String)]
    // all three operators are stateless scan-local expressions, so the
    // exact batch columns drop into readStream with no state store at all
    val stream = input.toDS().toDF("doc_id", "text")
      .withColumn("c4", C4Rules.cleanPage(col("text")))
      .withColumn("n_prints", size(Dedup.winnowFingerprints(col("text"), 3, 2)))
      .where(col("c4.page_kept") === 1)
    val cleaned = Decontaminate.canaryHits(
      stream.select(col("doc_id"), col("c4.text_clean").as("text"), col("n_prints")),
      "doc_id", "text", Seq(canary))
    val query = stream.select("doc_id", "c4.n_kept", "n_prints")
      .writeStream.outputMode("append")
      .format("memory").queryName("c4_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_c4").toString)
      .start()
    val canaryQuery = cleaned
      .writeStream.outputMode("append")
      .format("memory").queryName("canary_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_can").toString)
      .start()
    try {
      input.addData(
        (1L, goodPage),
        (2L, goodPage + s"\n$goodLine leaked $canary here."),
        (3L, "too\nshort\npage"),
        (4L, goodPage + "\nfunction f() { }"))
      query.processAllAvailable()
      canaryQuery.processAllAvailable()
      val kept = spark.table("c4_stream_out")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
      // 3 fails min kept lines; 4 trips the brace page gate
      assert(kept.keySet === Set(1L, 2L))
      assert(kept(1L)._1 === 3 && kept(2L)._1 === 4)
      assert(kept.values.forall(_._2 > 0))
      // only doc 2 carries the canary, found by the automaton mid-stream
      val hits = spark.table("canary_stream_out")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(hits === Set((2L, canary)))
      // batch parity: same columns, same verdicts
      val batch = Seq((1L, goodPage),
          (2L, goodPage + s"\n$goodLine leaked $canary here."),
          (3L, "too\nshort\npage"), (4L, goodPage + "\nfunction f() { }"))
        .toDF("doc_id", "text")
        .withColumn("c4", C4Rules.cleanPage(col("text")))
        .where(col("c4.page_kept") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch === kept.keySet)
    } finally { query.stop(); canaryQuery.stop() }
  }

  test("streaming incremental dedup: new micro-batches drop docs already in the static store") {
    // the daily-crawl steady state under readStream: the fingerprint store
    // is a STATIC frame, the crawl is a stream, and the stream-static
    // left-anti join runs per micro-batch with no stream-side state
    import graft.pipeline.Incremental
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Incremental.exactFingerprints(
      Seq((1L, "seen before"), (2L, "also seen")).toDF("id", "text"), "text")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("id", "text")
    val kept = stream.join(store,
      md5(stream("text")) === store("text_hash"), "left_anti")
    val query = kept.writeStream.outputMode("append")
      .format("memory").queryName("inc_dedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_inc").toString)
      .start()
    try {
      input.addData((10L, "seen before"), (11L, "fresh one"))
      query.processAllAvailable()
      input.addData((12L, "also seen"), (13L, "another fresh"))
      query.processAllAvailable()
      val ids = spark.table("inc_dedup_out").select("id").collect()
        .map(_.getLong(0)).toSet
      assert(ids === Set(11L, 13L), "store hits dropped in every micro-batch")
    } finally query.stop()
  }

  test("streaming KLL sketch: grouped quantiles over micro-batches equal the batch result") {
    import graft.pipeline.QuantileSketch
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val rows = (0 until 600).map(i => (s"g${i % 3}", rnd.nextInt(100000).toLong))
    val input = MemoryStream[(String, Long)]
    // complete-mode grouped aggregate: the TypedImperativeAggregate's
    // serialize/merge path is exactly what the state store exercises
    val agg = input.toDS().toDF("g", "v")
      .groupBy("g")
      .agg(QuantileSketch.quantiles(col("v"), Seq(500, 900), capacity = 1024).as("qs"))
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kll_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_kll").toString)
      .start()
    try {
      rows.grouped(150).foreach { chunk => input.addData(chunk); query.processAllAvailable() }
      val streamed = spark.table("kll_stream_out")
        .select(col("g"), explode(col("qs")).as("q"))
        .select(col("g"), col("q.q_permille"), col("q.value"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batch = rows.toDF("g", "v").groupBy("g")
        .agg(QuantileSketch.quantiles(col("v"), Seq(500, 900), capacity = 1024).as("qs"))
        .select(col("g"), explode(col("qs")).as("q"))
        .select(col("g"), col("q.q_permille"), col("q.value"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      // exact regime (200 values per group << capacity): both are the
      // exact discrete quantile, so equality is guaranteed, not just close
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming SpaceSaving top-k: grouped sketch over micro-batches equals the batch result (exact regime)") {
    import graft.pipeline.TopKSketch
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(47)
    // zipfish token stream over 3 groups; < capacity distinct per group
    // so the sketch is in its exact regime and streaming MUST equal batch
    val rows = (0 until 900).map { i =>
      (s"g${i % 3}", s"tok${(math.pow(rnd.nextDouble(), 2) * 40).toInt}")
    }
    val agg = (d: org.apache.spark.sql.DataFrame) => d.groupBy("g")
      .agg(TopKSketch.topK(col("v"), n = 5, capacity = 256).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.item"), col("t.count"))
    val input = MemoryStream[(String, String)]
    val query = agg(input.toDS().toDF("g", "v"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_topk").toString)
      .start()
    try {
      rows.grouped(200).foreach { chunk => input.addData(chunk); query.processAllAvailable() }
      val streamed = spark.table("topk_stream_out").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = agg(rows.toDF("g", "v")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally query.stop()
  }

  test("native session_window rollup: batch parity with sessionStats (incl. exact-gap boundary), " +
      "streaming append emits completed sessions") {
    import graft.streaming.Sessions
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 1000L
    // u1: one session with an EXACT-gap step (diff == gap must merge, the
    // boundary both formulations must agree on), then a break, then a
    // singleton; u2: one session
    val events = Seq(
      ("u1", 0L, 1L), ("u1", 1000L, 2L), ("u1", 1500L, 3L), // session A (exact gap inside)
      ("u1", 5000L, 4L),                                    // session B (gap 3500 > 1000)
      ("u2", 100L, 5L), ("u2", 600L, 6L))
    val df = events.toDF("user", "ms", "eid")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // batch parity: native rollup == lag/running-sum rollup, keyed by
    // (entity, first_event) since the two number sessions differently
    val native = Sessions.sessionWindowStats(df, "user", "ms", "eid", gap)
      .select(col("user"), col("n_events"), col("first_event"),
        col("last_event"), col("duration_ms")).collect()
    val classic = Sessions.sessionStats(df, "user", "ms", "eid", gap)
      .select(col("user"), col("n_events"), col("first_event"),
        col("last_event"), col("duration_ms")).collect()
    assert(canon(native) === canon(classic))
    assert(canon(native).contains(("u1", 3L, 1L, 3L, 1500L)), s"exact-gap merge: ${canon(native)}")
    // streaming: append mode emits a session once the watermark passes its
    // end + gap; the late sentinel only advances the watermark
    val input = MemoryStream[(String, Long, Long)]
    val stream = Sessions.sessionWindowStats(
      input.toDS().toDF("user", "ms", "eid"), "user", "ms", "eid", gap,
      watermarkDelayMs = Some(0L))
    val query = stream.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_sess").toString)
      .start()
    try {
      // batches split so no event falls behind the 0-delay watermark
      // (max ts seen so far), while u1's session A still MERGES across
      // the batch boundary through the session state store
      input.addData(Seq(("u1", 0L, 1L), ("u1", 1000L, 2L),
        ("u2", 100L, 5L), ("u2", 600L, 6L))); query.processAllAvailable()
      input.addData(Seq(("u1", 1500L, 3L), ("u1", 5000L, 4L)))
      query.processAllAvailable()
      input.addData(("wm", 10_000_000L, 99L)); query.processAllAvailable()
      val streamed = spark.table("sess_stream_out")
        .where(col("user") =!= "wm")
        .select(col("user"), col("n_events"), col("first_event"),
          col("last_event"), col("duration_ms")).collect()
      assert(canon(streamed) === canon(classic))
    } finally query.stop()
  }
}
