package graft.tools

import graft.streaming.{Databus, Subscription}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: break down fanout cost — subscription count scaling, match
  * density, and the fixed per-row overhead — to find where the 500-sub
  * single-pass fanout spends its time. */
object FanoutProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = graft.engine.EventLog.changes(spark, "/root/testdata/sf0.1")
      .select("table", "key", "ms", "seq", "node", "tags")
      .persist()
    val n = events.count()
    def subsOf(k: Int): Seq[Subscription] = FanoutFixtures.subscriptionMix(k)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val out = f
      println(f"FANOUT_PROFILE $name out=$out secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    timed("warm")(events.count())
    for (k <- Seq(50, 125, 250, 500)) {
      timed(s"subs_$k") {
        Databus.fanout(events, subsOf(k), unionPathMaxSubs = 16)
          .queryExecution.toRdd.count()
      }
    }
    // match density: how many output rows at 500?
    timed("out_rows_500") {
      Databus.fanout(events, subsOf(500), unionPathMaxSubs = 16).count()
    }
    // never-matching subs isolate eval cost from explode/output cost
    val noMatch = (1 to 500).map(i => Subscription(s"n$i", s"""{..,"~tags":contains("zzz$i")}"""))
    timed("no_match_500") {
      Databus.fanout(events, noMatch, unionPathMaxSubs = 16)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
