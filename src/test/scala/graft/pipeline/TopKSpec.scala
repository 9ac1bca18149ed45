package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test for the shuffle-free per-partition heap top-k against
  * the naive global-window formulation it replaces — random scores with
  * deliberate duplicates (tie-break), several partitionings, string ids. */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("heap top-k equals the naive global window under random ties and partitionings") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // coarse random scores -> plenty of exact duplicates per query
    val rows = for (q <- 0 until 5; i <- 0 until 400)
      yield (q.toLong, i.toLong, rnd.nextInt(40).toDouble)
    for (parts <- Seq(1, 3, 13); k <- Seq(1, 7, 50)) {
      val df = rows.toDF("query_id", "neighbor_id", "score").repartition(parts)
      val got = Similarity.rankTopKPerQuery(df, "query_id", "score", "neighbor_id", k)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id".asc)
      val naive = df.withColumn("rank", row_number().over(w)).where($"rank" <= k)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === naive, s"parts=$parts k=$k")
    }
  }

  test("heap top-k handles non-long id types (string tie column)") {
    val s = spark
    import s.implicits._
    val df = Seq(("q1", "a", 1.0), ("q1", "b", 1.0), ("q1", "c", 2.0),
                 ("q2", "a", 5.0))
      .toDF("query_id", "neighbor_id", "score").repartition(3)
    val got = Similarity.rankTopKPerQuery(df, "query_id", "score", "neighbor_id", 2)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("q1", 1, "c"), ("q1", 2, "a"), ("q2", 1, "a")))
  }

  test("recallAtK: integer per-query audit, rank>k ignored, zero-hit queries kept") {
    val s = spark
    import s.implicits._
    def frame(rows: (Long, Int, Long)*) =
      rows.toDF("query_id", "rank", "neighbor_id")
    val exact = frame((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
                      (2L, 1, 20L), (2L, 2, 21L),
                      (3L, 1, 30L))
    val approx = frame((1L, 1, 11L), (1L, 2, 99L), (1L, 3, 10L),
                       (2L, 1, 98L), (2L, 2, 97L),
                       (3L, 1, 30L),
                       // rank 4 rows on both sides must be IGNORED at k=3
                       (1L, 4, 12L))
    val got = Similarity.recallAtK(exact, approx, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // q1: exact {10,11,12}, approx<=3 {11,99,10} -> 2 hits of 3
    // q2: zero overlap -> present with 0 hits (left join, not dropped)
    // q3: perfect recall 1/1
    assert(got === Map(1L -> ((3L, 2L)), 2L -> ((2L, 0L)), 3L -> ((1L, 1L))))
    // auditing a k'=3 result at k=1 uses only the rank-1 rows
    val at1 = Similarity.recallAtK(exact, approx, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(at1 === Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L)), 3L -> ((1L, 1L))))
  }
}
