package graft.spark

import graft.pipeline.{Bloom, Decontaminate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom membership prefilter: no false negatives, fpp in the designed
  * ballpark, and the decontamination bloom path is output-identical to the
  * exact broadcast-join path while filtering inside the scan stage. */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no false negatives; fpp within 3x of design") {
    val rnd = new scala.util.Random(42)
    val members = Array.fill(5000)(rnd.nextLong())
    val f = Bloom.build(members, members.length.toLong, fpp = 0.01)
    members.foreach(h => assert(f.mightContain(h)))
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(members.contains)
    val fp = probes.count(f.mightContain).toDouble / probes.length
    assert(fp < 0.03, s"false-positive rate $fp way above designed 0.01")
  }

  test("expression evaluates in a dataframe filter") {
    val s = spark
    import s.implicits._
    val f = Bloom.build(Seq(101L, 202L, 303L), 3, 0.01)
    val kept = Seq(101L, 202L, 303L, 404L, 505L).toDF("h")
      .where(Bloom.mightContain(col("h"), f))
      .collect().map(_.getLong(0)).toSet
    assert(Set(101L, 202L, 303L).subsetOf(kept)) // no false negatives
    assert(kept.size <= 5)
  }

  test("bloom decontamination path is identical to the exact path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")
    def text(): String = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0L until 200L).map(i => (i, text())).toDF("doc_id", "text")
    val evalSet = docs.where(col("doc_id") < 15).select("text")
    val corpus = docs.where(col("doc_id") >= 15)
    for (n <- Seq(3, 5); minHits <- Seq(1, 2)) {
      val exact = Decontaminate.contaminatedIds(corpus, "doc_id", "text",
          evalSet, "text", n = n, minHits = minHits)
        .collect().map(_.getLong(0)).toSet
      val bloomed = Decontaminate.contaminatedIdsBloom(corpus, "doc_id", "text",
          evalSet, "text", n = n, minHits = minHits, fpp = 0.05)
        .collect().map(_.getLong(0)).toSet
      assert(bloomed === exact, s"n=$n minHits=$minHits")
    }
  }

  test("plan shape: bloom probe filters before the semi-join") {
    val s = spark
    import s.implicits._
    val docs = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i q$i")).toDF("doc_id", "text")
    val plan = Decontaminate.contaminatedIdsBloom(docs, "doc_id", "text",
        docs.limit(5).select("text"), "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontain") || plan.contains("BloomMightContain"),
      s"bloom probe missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "exact verify join must remain")
  }

  test("oversized bitset rejects with the broadcast-join pointer, not a JVM error") {
    // 100B items at 1% fpp needs a ~120 GB bitset: plan-embedded state is
    // the wrong tool and the raw Int cast would NegativeArraySizeException
    val err = intercept[IllegalArgumentException](
      Bloom.empty(100000000000L, 0.01))
    assert(err.getMessage.contains("broadcast"))
    // the practical end of the range still builds (10M items ~ 12 MB)
    assert(Bloom.empty(10000000L, 0.01).bits.length > 0)
  }
}
