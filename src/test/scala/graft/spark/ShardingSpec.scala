package graft.spark

import graft.pipeline.Sharding
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic shard export: partition/rerun invariance, balance,
  * interleave, write-order round-trip. */
class ShardingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(n: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"src${i % 7}", s"doc $i"))
      .toDF("id", "source", "text").repartition(parts)
  }

  test("assignments are a partition- and rerun-invariant permutation") {
    val a = Sharding.shardAssignments(corpus(500, 3), "id", nShards = 8, seed = 42)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val b = Sharding.shardAssignments(corpus(500, 11), "id", nShards = 8, seed = 42)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
    // a permutation: every id exactly once; positions within a shard are 1..n
    assert(a.map(_._3) === (0L until 500L).toSet)
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) === (1 to rows.size).toSet)
    }
  }

  test("seed changes the permutation; shards are balanced and interleaved") {
    val base = corpus(2000, 4)
    val s42 = Sharding.shardAssignments(base, "id", 8, seed = 42)
      .collect().map(r => (r.getLong(2), (r.getInt(0), r.getInt(1)))).toMap
    val s43 = Sharding.shardAssignments(base, "id", 8, seed = 43)
      .collect().map(r => (r.getLong(2), (r.getInt(0), r.getInt(1)))).toMap
    assert(s42 !== s43)
    // balance: md5 mod-8 over 2000 rows — every shard within 2x of even share
    val sizes = s42.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size === 8)
    sizes.values.foreach(n => assert(n > 125 && n < 500, s"unbalanced shard: $n"))
    // interleave: every shard sees every source
    val stats = Sharding.shardStats(base, "id", "source", 8, 42)
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    stats.foreach { case (_, nSrc) => assert(nSrc === 7) }
  }

  test("written shards read back in assignment order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val base = corpus(300, 5)
    Sharding.writeShards(base, "id", nShards = 4, seed = 7, path = dir)
    val expect = Sharding.shardAssignments(base, "id", 4, seed = 7)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    // parquet preserves within-file row order; read per shard directory
    val got = (0 until 4).flatMap { sh =>
      spark.read.parquet(s"$dir/shard=$sh").select("id").collect()
        .map(r => (sh, r.getLong(0)))
    }
    assert(got.toSeq === expect.toSeq)
    // the shuffle actually decorrelates ingest order: the first shard's
    // read order is not id order
    val firstShardIds = got.filter(_._1 == 0).map(_._2)
    assert(firstShardIds !== firstShardIds.sorted)
  }

  test("write arrangement plan: one exchange, no global sort") {
    val plan = Sharding.shardedForWrite(corpus(100, 3), "id", 4, 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"))
    // Sort must be partition-local (global=false renders without "global=true")
    assert(!plan.contains("global=true"), s"global sort in:\n$plan")
  }
}
