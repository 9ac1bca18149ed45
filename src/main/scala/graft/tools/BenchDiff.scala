package graft.tools

/** Per-query bench regression harness over two `BENCH_full_r{N}.json`
  * artifacts (the complete per-query maps Bench writes each round).
  *
  * Usage: `runMain graft.tools.BenchDiff PREV.json CUR.json [OUT.json]`
  *
  * Replaces the judge's manual headline-overlap diff with a full-surface
  * contract: any query slower than `ratioFlag`× its prior-round time is a
  * REGRESSION, noise-filtered three ways — an absolute floor (`minSecs`,
  * default 0.3 s: sub-300ms queries swing multiples on VM noise alone,
  * applied to BOTH sides by flooring the ratio's denominator at `minSecs`,
  * so a sub-floor prior like 0.05s→0.35s — or a 0s prior — cannot
  * manufacture a multiple out of what is itself noise), an ADDITIVE noise
  * allowance on the threshold itself (`cur` must exceed
  * `ratioFlag × max(prev, minSecs)` by MORE than `minSecs`: a prior
  * sitting exactly AT the noise floor — 0.30 s → 0.64 s — otherwise
  * crosses 2× on sub-noise drift alone, which the r7/r8 `url_dedup` row
  * demonstrated two rounds running; a real regression on any ≥1 s query
  * clears the extra 0.3 s trivially), and the fact that each input is
  * already the min of the bench's reps.
  * Failed rows (-1 sentinels) and added/removed queries are reported
  * separately, never as regressions. Exit code 1 when regressions exist,
  * so a driver/CI step can gate on it; the report is always written. */
object BenchDiff {

  final case class Row(query: String, prev: Double, cur: Double, ratio: Double)
  final case class Report(regressions: Seq[Row], improvements: Seq[Row],
                          added: Seq[String], removed: Seq[String],
                          failedPrev: Seq[String], failedCur: Seq[String],
                          prevTotal: Double, curTotal: Double)

  /** The pure rule (unit-tested in BenchDiffSpec). */
  def diff(prev: Map[String, Double], cur: Map[String, Double],
           ratioFlag: Double = 2.0, minSecs: Double = 0.3): Report = {
    val shared = (prev.keySet & cur.keySet).toSeq.sorted
      .filter(q => prev(q) >= 0 && cur(q) >= 0) // -1 = failed-row sentinel
    val rows = shared.map { q =>
      val p = prev(q); val c = cur(q)
      // denominator floored at minSecs: a sub-floor (or zero) prior is
      // itself noise, so the honest multiple is "vs the noise floor"
      Row(q, p, c, c / math.max(p, minSecs))
    }
    Report(
      // ratio gate PLUS additive allowance: cur must beat ratioFlag× the
      // floored prior by more than minSecs, so a prior at the noise floor
      // cannot flag on drift that is itself sub-noise
      regressions = rows.filter(r => r.cur >= minSecs && r.ratio > ratioFlag &&
          r.cur > ratioFlag * math.max(r.prev, minSecs) + minSecs)
        .sortBy(-_.ratio),
      improvements = rows.filter(r => r.prev >= minSecs && r.ratio < 1.0 / ratioFlag)
        .sortBy(_.ratio),
      added = (cur.keySet -- prev.keySet).toSeq.sorted,
      removed = (prev.keySet -- cur.keySet).toSeq.sorted,
      failedPrev = prev.filter(_._2 < 0).keys.toSeq.sorted,
      failedCur = cur.filter(_._2 < 0).keys.toSeq.sorted,
      prevTotal = prev.values.filter(_ >= 0).sum,
      curTotal = cur.values.filter(_ >= 0).sum)
  }

  final case class RepDisagreement(key: String, reps: Seq[Double], ratio: Double)

  /** Intra-run rep-disagreement advisory (the r8 bimodality signature —
    * e.g. the driver's r9 sink reps of 51 s vs 13 s): Bench emits every
    * streaming measurement per-rep as `<key>_repN`; any base key whose
    * successful reps disagree by more than `ratioFlag`× is surfaced as its
    * own advisory category — NOT a regression and NOT a gate (best-of-reps
    * stays the headline), but the one-artifact signal that a measurement
    * was bimodal and the merged value sits on the lucky mode. `minVal`
    * suppresses sub-noise pairs (two sub-0.3 s timings disagreeing by 4×
    * are both noise; every rows/s key clears it trivially). Failed-rep
    * sentinels (-1) are excluded — a crash is failedCur's business. */
  def repDisagreements(streaming: Map[String, Double], ratioFlag: Double = 3.0,
                       minVal: Double = 0.3): Seq[RepDisagreement] = {
    val repPat = "^(.*)_rep(\\d+)$".r
    streaming.toSeq
      .collect { case (repPat(base, i), v) => (base, i.toInt, v) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (base, entries) =>
        val ordered = entries.sortBy(_._2).map(_._3)
        val good = ordered.filter(_ >= 0)
        if (good.size < 2 || good.max < minVal) None
        else {
          val ratio = good.max / math.max(good.min, 1e-9)
          if (ratio > ratioFlag) Some(RepDisagreement(base, ordered, ratio))
          else None
        }
      }
  }

  /** Reads the "streaming" map out of a Bench JSON line file (empty when
    * the artifact predates the streaming section). */
  def readStreaming(path: String): Map[String, Double] =
    readField(path, "streaming", required = false)

  /** One numeric-object field out of a Bench JSON line file; `required`
    * distinguishes the contract field (queries) from the optional ones
    * older artifacts lack (streaming pre-r9, host pre-r10). */
  private def readField(path: String, field: String, required: Boolean): Map[String, Double] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val outer = mapper.readTree(java.nio.file.Paths.get(path).toFile)
    // the driver's BENCH_rNN.json wraps the Bench JSON line in
    // {n, rc, cpus, sf, tail, parsed: {...}} — r10's 21x sink-rep split sat
    // un-flagged because this reader only understood the bare line; accept
    // both shapes so the driver pair adjudicates through the same advisory
    val root = if (outer.has("parsed") && outer.get("parsed").isObject)
      outer.get("parsed") else outer
    val node = root.get(field)
    if (node == null || !node.isObject) {
      require(!required, s"$path has no $field object")
      return Map.empty
    }
    val b = Map.newBuilder[String, Double]
    node.properties().forEach(e => b += e.getKey -> e.getValue.asDouble())
    b.result()
  }

  /** Reads the "host" telemetry object out of a Bench JSON line file
    * (empty when the artifact predates r10's calibration keys) — surfaced
    * in the report so a regression adjudicates against the host state of
    * BOTH runs without opening either artifact. */
  def readHost(path: String): Map[String, Double] =
    readField(path, "host", required = false)

  /** Reads the "queries" map out of a Bench JSON line file. */
  def readQueries(path: String): Map[String, Double] =
    readField(path, "queries", required = true)

  private def esc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def render(r: Report, prevPath: String, curPath: String,
             ratioFlag: Double, minSecs: Double,
             repDis: Seq[RepDisagreement] = Seq.empty,
             hostPrev: Map[String, Double] = Map.empty,
             hostCur: Map[String, Double] = Map.empty): String = {
    def rowJson(x: Row) =
      f"""{"query":${esc(x.query)},"prev_sec":${x.prev}%.3f,"cur_sec":${x.cur}%.3f,"ratio":${x.ratio}%.2f}"""
    def arr(xs: Seq[String]) = xs.map(esc).mkString("[", ",", "]")
    def repJson(d: RepDisagreement) =
      f"""{"key":${esc(d.key)},"reps":${d.reps.map(v => f"$v%.3f").mkString("[", ",", "]")},"ratio":${d.ratio}%.2f}"""
    def hostJson(h: Map[String, Double]) = h.toSeq.sortBy(_._1)
      .map { case (k, v) => f"${esc(k)}:$v%.3f" }.mkString("{", ",", "}")
    s"""{"prev":${esc(prevPath)},"cur":${esc(curPath)},
       |"rule":{"ratio_flag":$ratioFlag,"min_secs":$minSecs,"abs_allowance_secs":$minSecs},
       |"ok":${r.regressions.isEmpty && r.failedCur.isEmpty},
       |"prev_total_sec":${f"${r.prevTotal}%.1f"},"cur_total_sec":${f"${r.curTotal}%.1f"},
       |"regressions":${r.regressions.map(rowJson).mkString("[", ",", "]")},
       |"improvements":${r.improvements.map(rowJson).mkString("[", ",", "]")},
       |"rep_disagreement":${repDis.map(repJson).mkString("[", ",", "]")},
       |"host_prev":${hostJson(hostPrev)},"host_cur":${hostJson(hostCur)},
       |"added":${arr(r.added)},"removed":${arr(r.removed)},
       |"failed_prev":${arr(r.failedPrev)},"failed_cur":${arr(r.failedCur)}}""".stripMargin
  }

  /** The driver-pair advisory block: rep-disagreements + host telemetry for
    * a second artifact pair (the driver's contended-host runs) rendered as
    * one JSON object — advisory only, never a gate (the driver host swings
    * 92-125 s on identical code; min-of-reps stays the headline). */
  def renderDriverSection(prevPath: String, curPath: String): String = {
    val repDis = repDisagreements(readStreaming(curPath))
    def repJson(d: RepDisagreement) =
      f"""{"key":${esc(d.key)},"reps":${d.reps.map(v => f"$v%.3f").mkString("[", ",", "]")},"ratio":${d.ratio}%.2f}"""
    def hostJson(h: Map[String, Double]) = h.toSeq.sortBy(_._1)
      .map { case (k, v) => f"${esc(k)}:$v%.3f" }.mkString("{", ",", "}")
    s"""{"prev":${esc(prevPath)},"cur":${esc(curPath)},
       |"rep_disagreement":${repDis.map(repJson).mkString("[", ",", "]")},
       |"host_prev":${hostJson(readHost(prevPath))},"host_cur":${hostJson(readHost(curPath))}}""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    // same locale pin as Bench.main: the report's f-interpolated fractions
    // must stay dot-decimal JSON under any host locale
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2,
      "usage: BenchDiff PREV.json CUR.json [OUT.json [DRIVER_PREV.json DRIVER_CUR.json]]")
    val (prevPath, curPath) = (args(0), args(1))
    val outPath = if (args.length > 2) args(2) else "BENCH_diff_latest.json"
    val ratioFlag = sys.env.getOrElse("SPARK_GRAFT_DIFF_RATIO", "2.0").toDouble
    val minSecs = sys.env.getOrElse("SPARK_GRAFT_DIFF_MIN_SECS", "0.3").toDouble
    val r = diff(readQueries(prevPath), readQueries(curPath), ratioFlag, minSecs)
    val repDis = repDisagreements(readStreaming(curPath))
    var json = render(r, prevPath, curPath, ratioFlag, minSecs, repDis,
      readHost(prevPath), readHost(curPath))
    // optional second pair: the DRIVER's wrapped artifacts, advisory-only
    val driverDis = if (args.length > 4) {
      val section = renderDriverSection(args(3), args(4))
      json = json.dropRight(1) + s""",\n"driver":$section}"""
      repDisagreements(readStreaming(args(4)))
    } else Seq.empty
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    println(json)
    repDis.foreach(d => System.err.println(
      f"[benchdiff] REP DISAGREEMENT (advisory): ${d.key} reps ${d.reps.mkString("/")} (${d.ratio}%.1fx)"))
    driverDis.foreach(d => System.err.println(
      f"[benchdiff] DRIVER REP DISAGREEMENT (advisory): ${d.key} reps ${d.reps.mkString("/")} (${d.ratio}%.1fx)"))
    if (r.regressions.nonEmpty || r.failedCur.nonEmpty) {
      System.err.println(s"[benchdiff] ${r.regressions.size} regression(s), " +
        s"${r.failedCur.size} failed row(s) — see $outPath")
      sys.exit(1)
    }
  }
}
