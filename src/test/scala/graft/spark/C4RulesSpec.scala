package graft.spark

import graft.pipeline.{C4Rules, Mixing}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C4 line/page rules on crafted pages, and integer-exact epoch expansion
  * (copy counts match the md5-residue definition, computed independently
  * here with java MessageDigest). */
class C4RulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("line rules: terminal punct, min words, javascript") {
    val s = spark
    import s.implicits._
    val page = Seq(
      "This line has enough words and ends well.",
      "Short line.", // < 5 words
      "No terminal punctuation here at all",
      "Please enable JavaScript to view the comments.", // javascript
      "Another perfectly reasonable sentence follows here!").mkString("\n")
    val got = Seq(Tuple1(page)).toDF("text")
      .select(C4Rules.cleanPage(col("text")).as("c"))
      .select("c.n_lines", "c.n_kept", "c.page_kept", "c.text_clean").head()
    assert(got.getInt(0) === 5)
    assert(got.getInt(1) === 2)
    assert(got.getInt(2) === 0) // only 2 kept < minLines 3
    assert(got.getString(3) ===
      "This line has enough words and ends well.\nAnother perfectly reasonable sentence follows here!")
  }

  test("page rules: lorem ipsum and curly braces reject the page") {
    val s = spark
    import s.implicits._
    val good = (1 to 4).map(i => s"Sentence number $i is long enough to pass easily.").mkString("\n")
    val rows = Seq(
      (1L, good),
      (2L, good + "\nAnd some Lorem Ipsum filler text appears right here."),
      (3L, good + "\nfunction f() { return 1; }"))
      .toDF("id", "text")
    val got = rows.select(col("id"), C4Rules.cleanPage(col("text")).getField("page_kept").as("k"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  private def md5residue(key: String, den: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % den
  }

  test("epochExpand copy counts match the md5-residue definition exactly") {
    val s = spark
    import s.implicits._
    val docs = (0 until 120).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "unmapped"))
      .toDF("id", "source")
    val epochs = Map("a" -> (5, 2), "b" -> (3, 4))
    val got = Mixing.epochExpand(docs, "id", "source", epochs)
      .groupBy("id", "source").agg(count(lit(1)).as("n"),
        collect_set("epoch_idx").as("idxs"))
      .collect()
    got.foreach { r =>
      val (id, src, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      val (num, den) = epochs.getOrElse(src, (1, 1))
      val expected = num / den + (if (md5residue(id.toString, den) < num % den) 1 else 0)
      assert(n === expected, s"id=$id src=$src")
      assert(r.getSeq[Int](3).sorted === (0 until expected).toSeq, s"idxs id=$id")
    }
    // source b at 3/4 epochs: some docs get 0 copies and vanish
    val bIds = (0 until 120).filter(_ % 3 == 1)
    val bSurvivors = got.count(_.getString(1) == "b")
    val bExpected = bIds.count(i => md5residue(i.toString, 4) < 3)
    assert(bSurvivors === bExpected && bSurvivors < bIds.size)
    // unmapped sources keep exactly one epoch
    assert(got.filter(_.getString(1) == "unmapped").forall(_.getLong(2) == 1L))
  }

  test("epochExpand is partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = (0 until 60).map(i => (i.toLong, "a")).toDF("id", "source")
    def run(parts: Int) = Mixing.epochExpand(docs.repartition(parts), "id", "source",
        Map("a" -> (7, 3)))
      .select("id", "epoch_idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(run(2) === run(7))
  }
}
