package graft.spark

import graft.pipeline.{Dedup, Incremental}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup of a new batch against a persisted fingerprint /
  * signature store (the daily-crawl steady state). */
class IncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("incrementalExact: store wins cross-batch, min id wins intra-batch") {
    val curated = docs((1L, "alpha doc"), (2L, "beta doc"))
    val fp = Incremental.exactFingerprints(curated, "text")
    val batch = docs(
      (10L, "alpha doc"),      // already in store
      (11L, "gamma doc"),      // fresh
      (12L, "gamma doc"),      // intra-batch dup of 11
      (13L, "delta doc"))
    val kept = Incremental.incrementalExact(batch, "id", "text", fp)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 13L))
    // appending accepted docs' fingerprints makes the next run see them
    val fp2 = fp.unionByName(Incremental.exactFingerprints(
      batch.where(col("id").isin(11L, 13L)), "text")).distinct()
    val batch2 = docs((20L, "gamma doc"), (21L, "epsilon doc"))
    val kept2 = Incremental.incrementalExact(batch2, "id", "text", fp2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 === Set(21L))
  }

  test("incrementalNearDup: edited copies flagged against the store, fresh docs pass") {
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val edited = base.replace("quiet", "noisy") // high Jaccard with base
    val fresh = "completely different content about spark shuffle partitions and codegen stages"
    val curated = docs((1L, base))
    val store = Incremental.minhashStore(curated, "id", "text")
    val batch = docs((10L, base), (11L, edited), (12L, fresh))
    val hits = Incremental.incrementalNearDupHits(batch, "id", "text", store,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = hits.groupBy(_._1)
    // the verbatim copy estimates jaccard 1.0 against the store
    assert(byNew(10L).exists { case (_, sid, est) => sid == 1L && est == 1.0 })
    assert(byNew.contains(11L)) // edited copy banded + cleared threshold
    assert(!byNew.contains(12L))
    val kept = Incremental.incrementalNearDup(batch, "id", "text", store,
        threshold = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(12L))
  }

  test("incrementalNearDup rejects band counts that don't divide k (silent zero-hit mode)") {
    val s = spark
    import s.implicits._
    val batch = Seq((1L, "some text here")).toDF("id", "text")
    val store = Incremental.minhashStore(batch, "id", "text", 3, 32)
    // bands > k would make rowsPerBand 0: every doc in one degenerate
    // bucket the size cap drops — ZERO hits, every near-dup admitted
    intercept[IllegalArgumentException] {
      Incremental.incrementalNearDupHits(batch, "id", "text", store,
        k = 32, bands = 64)
    }
    intercept[IllegalArgumentException] {
      Incremental.incrementalNearDupHits(batch, "id", "text", store,
        k = 32, bands = 7)
    }
  }

  test("incrementalNearDup rejects a store built at a different k (silent deflation)") {
    val s = spark
    import s.implicits._
    val batch = Seq((1L, "some text here")).toDF("id", "text")
    // a k=16 store queried at k=32: zip_with pads with nulls that count as
    // non-matching slots, so the estimate silently deflates and near-dups
    // slip through — must fail loud like the segSize guard
    val store16 = Incremental.minhashStore(batch, "id", "text", 3, 16)
    val err = intercept[IllegalArgumentException] {
      Incremental.incrementalNearDupHits(batch, "id", "text", store16, k = 32)
    }
    assert(err.getMessage.contains("k=16"))
  }

  test("signature estimator tracks exact jaccard on random edits") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = Seq.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    // replace a growing prefix of tokens: jaccard decreases with i
    val variants = (0 until 8).map { i =>
      val toks = base.split(" ")
      val mutated = toks.zipWithIndex.map { case (t, j) =>
        if (j < i * 6) s"x${j}x" else t
      }
      (i.toLong, mutated.mkString(" "))
    }
    val store = Incremental.minhashStore(docs((100L, base)), "id", "text", k = 64)
    val hits = Incremental.incrementalNearDupHits(variants.toDF("id", "text"),
        "id", "text", store, k = 64, bands = 16, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val exact = Dedup.ngramJaccardPairs(
        docs((100L, base) +: variants: _*), "id", "text")
      .where(col("id1") === 100L || col("id2") === 100L)
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (if (a == 100L) b else a) -> r.getDouble(2)
      }.toMap
    // estimator within 0.25 of exact for every banded variant (k=64)
    hits.foreach { case (id, est) =>
      exact.get(id).foreach(ex => assert(math.abs(est - ex) < 0.25,
        s"variant $id: est $est vs exact $ex"))
    }
    assert(hits(0L) === 1.0) // unmutated copy
  }

  test("determinism under repartition") {
    val curated = docs((1L to 20L).map(i => i -> s"stored document number $i with shared words"): _*)
    val store = Incremental.minhashStore(curated, "id", "text")
    val batch = docs((30L to 45L).map(i =>
      i -> (if (i % 3 == 0) s"stored document number ${i - 29} with shared words"
            else s"brand new page $i unlike anything")): _*)
    val a = Incremental.incrementalNearDup(batch, "id", "text", store, threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Incremental.incrementalNearDup(batch.repartition(7), "id", "text",
        store.repartition(5), threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("incrementalSegDedup: store windows and intra-batch dups drop, fresh text stays") {
    // store contains the window "common seg text"; batch doc 10 repeats it,
    // docs 11/12 share a NEW window (intra-batch), doc 13 is all fresh
    val store = Incremental.segmentHashStore(
      docs((1L, "common seg text anchor words here")), "id", "text", segSize = 3)
    val batch = docs(
      (10L, "common seg text fresh tail words"),
      (11L, "brand new boiler plate rides twice"),
      (12L, "brand new boiler plate rides again"),
      (13L, "wholly original content stands alone"))
    val out = Incremental.incrementalSegDedup(batch, "id", "text", store,
        segSize = 3, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (10L, 2, 1, "fresh tail words"),
      (11L, 2, 1, "plate rides twice"),   // only [brand new boiler] is shared
      (12L, 2, 1, "plate rides again"),
      (13L, 2, 0, "wholly original content stands alone")))
  }

  test("snapshotDiff classifies added/removed/modified/unchanged") {
    val oldSnap = docs((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val newSnap = docs((2L, "beta"), (3L, "gamma edited"), (4L, "delta"))
    val got = Incremental.snapshotDiff(oldSnap, newSnap, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "modified"), (4L, "added")))
  }

  test("snapshotDiff: null text means present-with-null, not absent") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("x"))).toDF("id", "text")
    val newSnap = Seq((1L, Some("fixed")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "text")
    val got = Incremental.snapshotDiff(oldSnap, newSnap, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "modified"), (2L, "unchanged"), (3L, "modified")))
  }

  test("incrementalSegDedup rejects a store built at a different segSize") {
    val store = Incremental.segmentHashStore(
      docs((1L, "a b c d e f")), "id", "text", segSize = 5)
    val batch = docs((10L, "a b c d e f"))
    val err = intercept[IllegalArgumentException] {
      Incremental.incrementalSegDedup(batch, "id", "text", store, segSize = 3)
    }
    assert(err.getMessage.contains("segSize=5"))
    // matching size passes and the store windows condemn the copy
    val ok = Incremental.incrementalSegDedup(batch, "id", "text", store, segSize = 5)
      .collect().head
    assert(ok.getString(3) === "")
  }

  test("incrementalSegDedup equals batch dedupSegments when the store is empty") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "d")
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val batch = docs(rows: _*)
    val empty = Seq.empty[Long].toDF("seg_hash")
    val inc = Incremental.incrementalSegDedup(batch, "id", "text", empty,
        segSize = 3, minDocs = 2)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val full = graft.pipeline.Lines.dedupSegments(batch, "id", "text",
        segSize = 3, minDocs = 2)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(inc === full)
  }
}
