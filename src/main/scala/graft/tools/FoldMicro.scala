package graft.tools
import graft.delta.DslParser
import graft.json.TimeUuid
import graft.resolve.Resolver
object FoldMicro {
  def main(args: Array[String]): Unit = {
    val types = Array("click","view","purchase","signup","error")
    val n = 1000000
    // pre-generate delta texts like EventLog.changes
    val deltas = Array.tabulate(n) { i =>
      val t = types(i % 5); val v = (i % 1000) / 10.0
      s"""{..,"last_type":"$t","last_value":$v,"last_$t":$v,"k":${i % 100}}"""
    }
    // warmup
    var w = 0
    while (w < 2) {
      val t0 = System.nanoTime()
      var i = 0
      var r = new Resolver("events", "k0", "p")
      while (i < n) {
        if (i % 6666 == 0) r = new Resolver("events", "k" + i, "p")
        r.update(TimeUuid(i.toLong, i, ""), DslParser.parseDelta(deltas(i)), Set.empty)
        i += 1
      }
      r.result()
      println(f"FOLD_MICRO pass=$w secs=${(System.nanoTime()-t0)/1e9}%.2f (${n/((System.nanoTime()-t0)/1e9)}%.0f rows/s single-thread)")
      w += 1
    }
  }
}
