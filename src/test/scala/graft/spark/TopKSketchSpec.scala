package graft.spark

import graft.pipeline.{SpaceSavingBuffer, TopKSketch}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving top-k: exact below capacity (partitioning-invariant),
  * over-estimate-within-err and heavy-hitter retention above capacity. */
class TopKSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sketch(rows: Seq[String], n: Int, capacity: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    rows.toDF("t").repartition(parts)
      .agg(TopKSketch.topK(col("t"), n, capacity).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select("e.item", "e.count", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("exact below capacity, err 0, partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)(s"tok${rnd.nextInt(30)}")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = truth.toSeq.sortBy { case (i, c) => (-c, i) }.take(10)
      .map { case (i, c) => (i, c, 0L) }
    for (parts <- Seq(1, 4, 7))
      assert(sketch(rows, n = 10, capacity = 64, parts).toSeq === expected, s"parts=$parts")
  }

  test("above capacity: counts over-estimate within err; heavy hitters retained") {
    val rnd = new scala.util.Random(17)
    // zipf-ish: few heavy items + a long tail of singletons
    val heavy = (0 until 5).flatMap(i => Seq.fill(400 - 50 * i)(s"heavy$i"))
    val tail = (0 until 3000).map(i => s"tail$i")
    val rows = rnd.shuffle(heavy ++ tail)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sketch(rows, n = 20, capacity = 256, parts = 4)
    got.foreach { case (item, count, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(count >= t, s"$item undercounted: $count < $t")
      assert(count - err <= t, s"$item bound violated: $count - $err > $t")
    }
    // every item with true frequency > N/capacity must be reported
    val threshold = rows.size.toDouble / 256
    val reported = got.map(_._1).toSet
    truth.filter(_._2 > threshold).keys.foreach { h =>
      assert(reported.contains(h), s"heavy hitter $h missing")
    }
    // and the 5 planted heavies lead the ranking
    assert(got.take(5).map(_._1).toSet === (0 until 5).map(i => s"heavy$i").toSet)
  }

  test("null inputs are ignored") {
    val s = spark
    import s.implicits._
    val got = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("t")
      .agg(TopKSketch.topK(col("t"), 5, 16).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }

  test("DIFFERENTIAL: lazy-heap eviction equals the linear-scan rule on saturated streams") {
    // reference implementation: the original O(capacity) min-scan with the
    // identical victim rule (min count, ties to the LARGER item) — the
    // heap-based buffer must produce byte-identical tables on any stream,
    // including heavy past-capacity churn where every arrival evicts
    case class Reverse(s: String) extends Ordered[Reverse] {
      def compare(o: Reverse): Int = o.s.compareTo(s)
    }
    def reference(capacity: Int, stream: Seq[String]): Map[String, (Long, Long)] = {
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      stream.foreach { item =>
        counts.get(item) match {
          case Some((c, e)) => counts(item) = (c + 1, e)
          case None if counts.size < capacity => counts(item) = (1L, 0L)
          case None =>
            val (vk, (vc, _)) = counts.minBy { case (k, (c, _)) => (c, Reverse(k)) }
            counts.remove(vk)
            counts(item) = (vc + 1, vc)
        }
      }
      counts.toMap
    }
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val cap = 16 + rnd.nextInt(17)
      // zipf-ish: a few heavy items + a long distinct tail that churns
      val stream = (1 to 2000).map { i =>
        if (rnd.nextInt(3) == 0) s"hot${rnd.nextInt(8)}" else s"tail${i}_$trial"
      }
      val buf = new SpaceSavingBuffer(cap)
      stream.foreach(buf.add(_, 1L, 0L))
      val got = {
        val b = Map.newBuilder[String, (Long, Long)]
        buf.counts.forEach((k, v) => b += k -> ((v(0), v(1))))
        b.result()
      }
      assert(got === reference(cap, stream), s"trial $trial cap $cap")
    }
  }
}
