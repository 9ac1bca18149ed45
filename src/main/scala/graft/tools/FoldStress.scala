package graft.tools

import graft.engine.EventLog
import graft.resolve.ResolveEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev tool: stress the resolve fold at a multiple of sf0.1 to sanity-check
 * the scale story (throughput per core, no per-group memory blowup).
 * Replicates the sf0.1 change log N times across N times as many documents.
 */
object FoldStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--hot")) {
      val n = args.dropWhile(_ != "--hot").drop(1).headOption
        .map(_.toInt).getOrElse(1000000)
      hotLogStress(spark, n)
      spark.stop(); return
    }
    val mult = if (args.nonEmpty) args(0).toInt else 10

    val base = EventLog.changes(spark, "/root/testdata/sf0.1")
    val replicas = spark.range(mult).withColumnRenamed("id", "rep")
    val big = base.crossJoin(replicas)
      .withColumn("key", concat(col("key"), lit("#"), col("rep")))
      .drop("rep")
    // materialize to a multi-file parquet source: models a real table scan
    // (the raw crossJoin has 1-2 input partitions, serializing the map side)
    val tmp = System.getProperty("java.io.tmpdir") + "/fold_stress_input"
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    val bigSrc = spark.read.parquet(tmp)
    val n = bigSrc.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"FOLD_STRESS $name%-12s rows=$n out=$out secs=$secs%.1f rows_per_sec=${n / secs}%.0f")
    }
    time("scan")(bigSrc.count())
    import org.apache.spark.sql.functions.{col => c}
    time("shuffle+sort")(bigSrc.repartition(c("table"), c("key"))
      .sortWithinPartitions("table", "key", "ms", "seq", "node").count())
    time("parse-only") {
      import spark.implicits._
      bigSrc.select("delta").as[String].mapPartitions { it =>
        var n = 0L; it.foreach { d => graft.delta.DslParser.parseDelta(d); n += 1 }
        Iterator.single(n)
      }.reduce(_ + _)
    }
    time("fold")(ResolveEngine.resolve(bigSrc).count())
    spark.stop()
  }

  /**
   * Hot-log mode (VERDICT r10 #2): the skewed-celebrity-doc case. The
   * resolve fold is per-key sequential (chained signature, conditional
   * deltas — salting is not available), so ONE document with ~1M deltas is
   * one long tail task no matter how many executors exist. The designed
   * mitigation is [[graft.resolve.Compactor.compactHot]]: checkpoint the
   * hot log's prefix into a synthetic base delta, leaving the fold only
   * the post-checkpoint suffix. This mode proves the mitigation
   * end-to-end with numbers:
   *
   *   1. plant a single `review:hot`/`celebrity` doc with `n` deltas
   *      (every delta mutates — no redundancy shortcut) in the sf0.1 log;
   *   2. fold the whole log and time it (the hot doc dominates the tail);
   *   3. [[graft.resolve.Compactor.skewReport]] must surface the doc,
   *      then `compactHot` checkpoints everything but the last 1000
   *      deltas (timed: this is the scheduled-maintenance cost);
   *   4. re-fold and time it — the tail task is now bounded by the
   *      1000-delta suffix;
   *   5. parity: the resolved hot doc (version/body/signature/timestamps)
   *      must be IDENTICAL before and after — exits nonzero otherwise.
   */
  private def hotLogStress(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    val suffixKeep = 1000L
    val threshold = 100000L
    val base = EventLog.changes(spark, "/root/testdata/sf0.1")
    // ms strictly increasing so the cutoff cleanly splits prefix/suffix;
    // "touched" changes every delta => every delta mutates content
    val hot = spark.range(n).select(
      lit("review:hot").as("table"), lit("celebrity").as("key"),
      (lit(1000000L) + col("id")).as("ms"), col("id").as("seq"),
      lit("node0").as("node"),
      concat(lit("{..,\"rating\":"), col("id") % 5,
        lit(",\"touched\":"), col("id"), lit("}")).as("delta"),
      array(lit("etl")).as("tags"))
    val tmp = System.getProperty("java.io.tmpdir") + "/fold_stress_hot"
    base.unionByName(hot).repartition(64).write.mode("overwrite").parquet(tmp)
    val src = spark.read.parquet(tmp)
    val total = src.count()

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"FOLD_STRESS_HOT $name%-16s secs=$secs%.1f"); (out, secs)
    }

    val (before, beforeSecs) = timed("fold_hot") {
      ResolveEngine.resolve(src)
        .filter(col("table") === "review:hot").collect()
    }
    require(before.length == 1 && before.head.version == n.toLong,
      s"hot doc did not fold to version $n: ${before.toSeq}")

    // the scheduler's view: the skew report must surface the planted doc
    val skew = graft.resolve.Compactor.skewReport(src, threshold).collect()
    require(skew.exists(r => r.getAs[String]("key") == "celebrity" &&
      r.getAs[Long]("n_changes") == n.toLong),
      s"skewReport missed the hot doc: ${skew.toSeq}")

    val cutoff = 1000000L + n - suffixKeep - 1 // keep the last 1000 deltas
    val tmpC = System.getProperty("java.io.tmpdir") + "/fold_stress_hot_compacted"
    val (_, compactSecs) = timed("compact_hot") {
      graft.resolve.Compactor.compactHot(src, cutoff, threshold)
        .repartition(64).write.mode("overwrite").parquet(tmpC)
    }
    val srcC = spark.read.parquet(tmpC)
    val compactedRows = srcC.count()

    val (after, afterSecs) = timed("fold_after") {
      ResolveEngine.resolve(srcC)
        .filter(col("table") === "review:hot").collect()
    }
    val b = before.head; val a = after.head
    val parity = a.version == b.version && a.body == b.body &&
      a.signature == b.signature && a.first_update_ms == b.first_update_ms &&
      a.last_update_ms == b.last_update_ms && a.last_mutate_ms == b.last_mutate_ms
    println(f"FOLD_STRESS_HOT summary n=$n total_rows=$total " +
      f"compacted_rows=$compactedRows suffix=$suffixKeep " +
      f"before=$beforeSecs%.1fs compact=$compactSecs%.1fs after=$afterSecs%.1fs " +
      f"speedup=${beforeSecs / afterSecs}%.1fx parity=$parity")
    if (!parity) {
      System.err.println(s"PARITY MISMATCH: before=$b after=$a")
      spark.stop(); sys.exit(1)
    }
  }
}
