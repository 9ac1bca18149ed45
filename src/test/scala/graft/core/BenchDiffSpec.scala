package graft.core

import graft.tools.BenchDiff
import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench regression rule: >ratio× prior time flags, noise-
  * filtered by the absolute floor; sentinels and added/removed queries
  * report separately, never as regressions. */
class BenchDiffSpec extends AnyFunSuite {

  test("flags only above-floor slowdowns past the ratio") {
    val prev = Map("a" -> 1.0, "b" -> 0.05, "c" -> 2.0, "d" -> 0.5)
    val cur = Map("a" -> 2.5,   // 2.5× and above floor -> regression
                  "b" -> 0.2,   // 4× but under the 0.3s floor -> noise
                  "c" -> 0.4,   // 5× faster -> improvement
                  "d" -> 0.9)   // 1.8× -> under the ratio, quiet
    val r = BenchDiff.diff(prev, cur, ratioFlag = 2.0, minSecs = 0.3)
    assert(r.regressions.map(_.query) === Seq("a"))
    assert(r.regressions.head.ratio === 2.5)
    assert(r.improvements.map(_.query) === Seq("c"))
    assert(r.added.isEmpty && r.removed.isEmpty)
  }

  test("sentinels and membership changes are reported separately") {
    val prev = Map("a" -> 1.0, "gone" -> 0.7, "failed_then" -> -1.0)
    val cur = Map("a" -> 1.1, "new" -> 0.5, "failed_then" -> 5.0,
                  "failed_now" -> -1.0)
    val r = BenchDiff.diff(prev, cur)
    // a prior -1 sentinel must not manufacture an infinite-ratio regression
    assert(r.regressions.isEmpty)
    assert(r.added.toSet === Set("new", "failed_now"))
    assert(r.removed === Seq("gone"))
    assert(r.failedPrev === Seq("failed_then"))
    assert(r.failedCur === Seq("failed_now"))
    // totals skip sentinels
    assert(math.abs(r.prevTotal - 1.7) < 1e-9)
    assert(math.abs(r.curTotal - 6.6) < 1e-9)
  }

  test("sub-floor prior cannot manufacture a regression out of noise") {
    // the ratio's denominator is floored at minSecs: 0.05s -> 0.35s is a
    // 7x raw multiple but both sides are VM noise — quiet; and a 0s prior
    // must not produce an Infinity ratio
    val r = BenchDiff.diff(Map("a" -> 0.05, "z" -> 0.0),
                           Map("a" -> 0.35, "z" -> 0.5),
                           ratioFlag = 2.0, minSecs = 0.3)
    assert(r.regressions.isEmpty)
    // a genuinely large jump off a noise-floor prior still flags: the
    // floored denominator gives the honest "vs the noise floor" multiple
    val r2 = BenchDiff.diff(Map("a" -> 0.05), Map("a" -> 1.2),
                            ratioFlag = 2.0, minSecs = 0.3)
    assert(r2.regressions.map(_.query) === Seq("a"))
    assert(math.abs(r2.regressions.head.ratio - 4.0) < 1e-9)
  }

  test("prior AT the noise floor cannot flag on sub-noise drift") {
    // the r7/r8 url_dedup adjudication, retired as a rule: a 0.30s prior
    // drifting to 0.64s crosses the 2x ratio but the movement is itself
    // sub-noise — the additive allowance (cur must beat ratioFlag x the
    // floored prior by MORE than minSecs) keeps it quiet
    val r = BenchDiff.diff(Map("url_dedup" -> 0.30), Map("url_dedup" -> 0.64),
                           ratioFlag = 2.0, minSecs = 0.3)
    assert(r.regressions.isEmpty)
    // past the allowance (2*0.3 + 0.3 = 0.9s) it flags again
    val r2 = BenchDiff.diff(Map("url_dedup" -> 0.30), Map("url_dedup" -> 0.95),
                            ratioFlag = 2.0, minSecs = 0.3)
    assert(r2.regressions.map(_.query) === Seq("url_dedup"))
    // the allowance is negligible relative to any >=1s real regression:
    // a 5s query doubling to 11s clears 2*5 + 0.3 trivially
    val r3 = BenchDiff.diff(Map("big" -> 5.0), Map("big" -> 11.0))
    assert(r3.regressions.map(_.query) === Seq("big"))
  }

  test("streaming rep-merge: min for times, max for rates, sentinel-safe") {
    // times/commit-ms keep the best (lowest) successful rep
    assert(graft.Bench.mergeReps(Seq(5.2, 4.8), lowerIsBetter = true) === 4.8)
    // rates keep the best (highest) — the cold rep pays plan/codegen
    assert(graft.Bench.mergeReps(Seq(32095.0, 60694.0), lowerIsBetter = false) === 60694.0)
    // a failed rep's -1 sentinel must not win a min merge
    assert(graft.Bench.mergeReps(Seq(-1.0, 4.8), lowerIsBetter = true) === 4.8)
    assert(graft.Bench.mergeReps(Seq(-1.0, 60694.0), lowerIsBetter = false) === 60694.0)
    // all reps failed => the sentinel survives so the floor check fires
    assert(graft.Bench.mergeReps(Seq(-1.0, -1.0), lowerIsBetter = false) === -1.0)
    assert(graft.Bench.mergeReps(Seq.empty, lowerIsBetter = true) === -1.0)
  }

  test("streaming floors apply only to an exact sf0.1 path segment") {
    assert(graft.Bench.isSf01("/root/testdata/sf0.1"))
    assert(graft.Bench.isSf01("/root/testdata/sf0.1/"))
    assert(graft.Bench.isSf01("/mnt/bench/sf0.1/parquet"))  // token not last
    assert(!graft.Bench.isSf01("/data/sf0.15"))  // substring trap
    assert(!graft.Bench.isSf01("/data/sf0.125"))
    assert(!graft.Bench.isSf01("/data/sf0.01"))
  }

  test("render emits parseable JSON with the ok verdict") {
    val r = BenchDiff.diff(Map("a" -> 1.0), Map("a" -> 1.1))
    val json = BenchDiff.render(r, "p.json", "c.json", 2.0, 0.3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    assert(root.get("ok").asBoolean())
    assert(root.get("regressions").size() === 0)
    assert(root.get("rep_disagreement").size() === 0)
  }

  test("intra-run rep disagreement surfaces as its own advisory") {
    // the driver's r9 sink pattern: reps 51s vs 13s inside ONE artifact
    val streaming = Map(
      "streaming_fanout500_sink_rep1" -> 51.0,
      "streaming_fanout500_sink_rep2" -> 13.0,
      // agreeing reps stay quiet (1.07x — the judge's idle-host signature)
      "streaming_fanout500_sink_rows_per_sec_rep1" -> 46000.0,
      "streaming_fanout500_sink_rows_per_sec_rep2" -> 49000.0,
      // non-rep keys are never grouped
      "streaming_fanout500_sink" -> 13.0)
    val d = BenchDiff.repDisagreements(streaming)
    assert(d.map(_.key) === Seq("streaming_fanout500_sink"))
    assert(d.head.reps === Seq(51.0, 13.0))
    assert(math.abs(d.head.ratio - 51.0 / 13.0) < 1e-9)
  }

  test("rep advisory ignores sub-noise pairs and failed-rep sentinels") {
    // two sub-0.3s timings disagreeing 4x are both noise
    assert(BenchDiff.repDisagreements(
      Map("x_rep1" -> 0.05, "x_rep2" -> 0.2)).isEmpty)
    // a -1 sentinel is failedCur's business, not a disagreement; the one
    // surviving rep has nothing to disagree with
    assert(BenchDiff.repDisagreements(
      Map("x_rep1" -> -1.0, "x_rep2" -> 20.0)).isEmpty)
    // rates disagreeing >3x DO flag (they clear minVal trivially)
    val d = BenchDiff.repDisagreements(
      Map("y_rows_per_sec_rep1" -> 9000.0, "y_rows_per_sec_rep2" -> 46000.0))
    assert(d.map(_.key) === Seq("y_rows_per_sec"))
  }

  test("rep advisory lands in the rendered JSON without flipping ok") {
    val r = BenchDiff.diff(Map("a" -> 1.0), Map("a" -> 1.1))
    val dis = BenchDiff.repDisagreements(Map("s_rep1" -> 51.0, "s_rep2" -> 13.0))
    val json = BenchDiff.render(r, "p.json", "c.json", 2.0, 0.3, dis)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.get("ok").asBoolean())  // advisory, not a gate
    assert(root.get("rep_disagreement").size() === 1)
    assert(root.get("rep_disagreement").get(0).get("key").asText() === "s")
    assert(root.get("rep_disagreement").get(0).get("reps").size() === 2)
  }

  test("readStreaming parses the artifact's streaming map; absent map reads empty") {
    val withMap = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(withMap,
      """{"metric":"total","value":1.0,"queries":{"a":1.0},
        |"streaming":{"s_rep1":51.0,"s_rep2":13.0,"s":13.0},
        |"host":{"loadavg_1m":2.2}}""".stripMargin.replace("\n", "").getBytes("UTF-8"))
    val m = BenchDiff.readStreaming(withMap.toString)
    assert(m === Map("s_rep1" -> 51.0, "s_rep2" -> 13.0, "s" -> 13.0))
    assert(BenchDiff.repDisagreements(m).map(_.key) === Seq("s"))
    assert(BenchDiff.readHost(withMap.toString) === Map("loadavg_1m" -> 2.2))
    // pre-r9 artifacts carry no streaming map: empty, not an error
    val without = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(without,
      """{"metric":"total","value":1.0,"queries":{"a":1.0}}""".getBytes("UTF-8"))
    assert(BenchDiff.readStreaming(without.toString) === Map.empty)
    assert(BenchDiff.readHost(without.toString) === Map.empty)
    // host objects render into the report for round-over-round adjudication
    val r = BenchDiff.diff(Map("a" -> 1.0), Map("a" -> 1.1))
    val json = BenchDiff.render(r, "p.json", "c.json", 2.0, 0.3, Seq.empty,
      Map.empty, Map("io_floor_scale" -> 0.959, "loadavg_1m" -> 2.2))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.get("host_prev").size() === 0)
    assert(root.get("host_cur").get("io_floor_scale").asDouble() === 0.959)
  }

  test("the driver's parsed/tail wrapper reads like a bare Bench line") {
    // BENCH_rNN.json (driver shape) wraps the line in {n, rc, ..., parsed};
    // r10's 21x sink-rep split went un-flagged because the reader only
    // understood the bare line — both shapes must surface the advisory
    val wrapped = java.nio.file.Files.createTempFile("bench_driver", ".json")
    java.nio.file.Files.write(wrapped,
      """{"n":10,"rc":0,"cpus":32,"sf":0.1,"tail":"...",
        |"parsed":{"metric":"total","value":139.9,"queries":{"a":1.0},
        |"streaming":{"sink_rep1":2.0,"sink_rep2":43.0,"sink":2.0},
        |"host":{"loadavg_1m":7.11}}}""".stripMargin.replace("\n", "").getBytes("UTF-8"))
    assert(BenchDiff.readQueries(wrapped.toString) === Map("a" -> 1.0))
    assert(BenchDiff.readHost(wrapped.toString) === Map("loadavg_1m" -> 7.11))
    val dis = BenchDiff.repDisagreements(BenchDiff.readStreaming(wrapped.toString))
    assert(dis.map(_.key) === Seq("sink") && dis.head.ratio > 20)
    // the driver advisory section renders as one parseable JSON object
    val section = BenchDiff.renderDriverSection(wrapped.toString, wrapped.toString)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(section)
    assert(root.get("rep_disagreement").get(0).get("key").asText() === "sink")
    assert(root.get("host_cur").get("loadavg_1m").asDouble() === 7.11)
  }

  test("sink floor scales with the io calibration; CPU floors do not") {
    val rates = Seq(
      "streaming_materializer_rows_per_sec" -> 17000.0,
      "streaming_materializer_fold_rows_per_sec" -> 78000.0,
      "streaming_fanout500_rows_per_sec" -> 11000.0,
      "streaming_materializer_commit_ms" -> 900.0,
      // the driver's contended r9 value: below the absolute 27,900 floor
      // but healthy for a host whose write capacity measured ~5x degraded
      "streaming_fanout500_sink_rows_per_sec" -> 7833.0)
    // idle host (scale 1.0): the absolute floor fires as before
    assert(graft.Bench.floorViolations(rates, "/root/testdata/sf0.1", 1.0)
      .exists(_.startsWith("streaming_fanout500_sink_rows_per_sec")))
    // contended host at the 0.2 clamp: floor 5,580 — the row clears, and
    // no CPU-bound floor moved (they'd fire identically at any scale)
    assert(graft.Bench.floorViolations(rates, "/root/testdata/sf0.1", 0.2).isEmpty)
    // a genuine collapse still gates even at the clamp
    val dead = rates.map { case (k, v) =>
      if (k == "streaming_fanout500_sink_rows_per_sec") (k, 4000.0) else (k, v) }
    assert(graft.Bench.floorViolations(dead, "/root/testdata/sf0.1", 0.2)
      .exists(_.startsWith("streaming_fanout500_sink_rows_per_sec")))
  }
}
