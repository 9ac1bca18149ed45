package graft.spark

import graft.pipeline.Packing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Length-bucketed bin packing: bin-capacity invariants, oversize docs,
  * driver-side reference differential, partitioning invariance. */
class BucketPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** driver-side reference: same banding, md5 order, arithmetic fill */
  private def reference(lens: Map[Long, Long], budget: Long, bw: Long) = {
    val banded = lens.map { case (id, n) =>
      (id, n, math.max(bw, (n + bw - 1) / bw * bw))
    }.toSeq
    val bandStarts = banded.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      .toSeq.sortBy(_._1)
    val starts = bandStarts.map(_._1)
      .zip(bandStarts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    banded.groupBy(_._3).flatMap { case (band, docs) =>
      val perBin = math.max(1L, budget / band)
      docs.sortBy(d => (md5hex(d._1.toString), d._1)).zipWithIndex.map {
        case ((id, n, _), r) =>
          id -> ((band, starts(band) + r / perBin, r % perBin))
      }
    }.toMap
  }

  test("matches the driver reference; bins respect the budget") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val lens = (0L until 300L).map(i => i -> (1L + rnd.nextInt(200))).toMap
    val df = lens.toSeq.toDF("id", "nt")
    val expected = reference(lens, budget = 256, bw = 32)
    for (parts <- Seq(2, 5)) {
      val got = Packing.lengthBucketedPack(df.repartition(parts), "id", "nt",
          budget = 256, bandWidth = 32)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got === expected, s"parts=$parts")
    }
    // capacity: docs-per-bin * band <= budget for every non-oversize band
    val byBin = expected.values.groupBy(v => (v._1, v._2))
    byBin.foreach { case ((band, _), members) =>
      if (band <= 256) assert(members.size * band <= 256, s"band $band overfull")
    }
  }

  test("oversize docs get singleton bins") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 700L), (2L, 700L), (3L, 10L), (4L, 12L)).toDF("id", "nt")
    val got = Packing.lengthBucketedPack(df, "id", "nt", budget = 256, bandWidth = 32)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // the two 700-token docs: distinct bins, slot 0
    assert(got(1L)._2 === 0L && got(2L)._2 === 0L && got(1L)._1 != got(2L)._1)
    // the two small docs share a bin (32-band, 8 per bin)
    assert(got(3L)._1 === got(4L)._1)
  }
}
