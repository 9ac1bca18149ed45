package graft.tools

/** Dev tool: compare two `graft.Bench` stdout captures (the per-query JSON
  * line) and print per-query deltas beyond a noise threshold, so a round's
  * perf movement separates into real changes vs host noise.
  *
  *   runMain graft.tools.BenchDiff old.log new.log [ratioThreshold]
  */
object BenchDiff {
  private val Entry = """"([a-zA-Z0-9_]+)":([0-9.E-]+)""".r

  private def queries(path: String): Map[String, Double] = {
    val line = scala.io.Source.fromFile(path).getLines()
      .filter(l => l.startsWith("{\"metric\"") && l.contains("\"queries\""))
      .toSeq.lastOption
      .getOrElse(sys.error(s"no bench JSON line in $path"))
    val body = line.substring(line.indexOf("\"queries\":{") + 11)
    Entry.findAllMatchIn(body.takeWhile(_ != '}'))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <old.log> <new.log> [ratio]")
    val threshold = if (args.length > 2) args(2).toDouble else 1.3
    val old = queries(args(0))
    val cur = queries(args(1))
    val shared = old.keySet.intersect(cur.keySet).toSeq.sorted
    println(f"shared=${shared.size} only_old=${(old.keySet -- cur.keySet).size} " +
      f"only_new=${(cur.keySet -- old.keySet).size} " +
      f"total_old=${shared.map(old).sum}%.1f total_new=${shared.map(cur).sum}%.1f")
    val moved = shared.map(q => (q, old(q), cur(q), cur(q) / old(q)))
      .filter { case (_, o, n, r) =>
        (r > threshold || r < 1 / threshold) && math.abs(n - o) > 0.15 }
      .sortBy(-_._4)
    moved.foreach { case (q, o, n, r) =>
      println(f"$q%-28s ${o}%6.2f -> ${n}%6.2f  (${r}%4.2fx)")
    }
    if (moved.isEmpty) println(s"no per-query movement beyond ${threshold}x")
    (cur.keySet -- old.keySet).toSeq.sorted.foreach(q =>
      println(f"NEW $q%-24s        -> ${cur(q)}%6.2f"))
  }
}
