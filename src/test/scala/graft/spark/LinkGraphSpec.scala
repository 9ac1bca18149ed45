package graft.spark

import graft.pipeline.LinkGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: hand-computed masses on a tiny graph, dangling-mass
  * evaporation, partitioning invariance, double/int rank-order agreement,
  * and href→domain-edge extraction parity on messy URLs. */
class LinkGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def massMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pageRankInt matches hand-computed masses (A->B, A->C, B->C, C->A)") {
    val s = spark
    import s.implicits._
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    // seed 1e6, base 150000, damp 85/100:
    // iter1: A<-C 850000; B<-A 425000; C<-A 425000 + B 850000
    val m1 = massMap(LinkGraph.pageRankInt(edges, iters = 1))
    assert(m1 === Map("A" -> 1000000L, "B" -> 575000L, "C" -> 1425000L))
    // iter2: A<-C floor(85*1425000/100)=1211250; B<-A 425000;
    //        C<-A 425000 + B floor(85*575000/100)=488750
    val m2 = massMap(LinkGraph.pageRankInt(edges, iters = 2))
    assert(m2 === Map("A" -> 1361250L, "B" -> 575000L, "C" -> 1063750L))
  }

  test("dangling mass evaporates; sink keeps base + inflow") {
    val s = spark
    import s.implicits._
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val m2 = massMap(LinkGraph.pageRankInt(edges, iters = 2))
    // iter1: A=150000, B=1000000; iter2: B <- floor(85*150000/100)=127500
    assert(m2 === Map("A" -> 150000L, "B" -> 277500L))
  }

  test("masses are partitioning-invariant (integer arithmetic)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val a = massMap(LinkGraph.pageRankInt(edges.repartition(7), iters = 3))
    val b = massMap(LinkGraph.pageRankInt(edges.repartition(2), iters = 3))
    assert(a === b)
  }

  test("double path agrees with the int path on rank ordering") {
    val s = spark
    import s.implicits._
    // a clear hierarchy: hub <- everyone, chain below
    val edges = ((0 until 10).map(i => (s"leaf$i", "hub")) ++
      Seq(("hub", "mid"), ("mid", "tail"))).toDF("src", "dst")
    val intTop = LinkGraph.pageRankInt(edges, iters = 3)
      .orderBy(desc("mass"), asc("node")).collect().map(_.getString(0)).take(3)
    val dblTop = LinkGraph.pageRank(edges, iters = 3)
      .orderBy(desc("rank"), asc("node")).collect().map(_.getString(0)).take(3)
    // after 3 iters the hub's iter-1 surge has flowed down the chain:
    // tail > hub > mid, leaves at base — both paths must agree on this
    assert(intTop.toSeq === dblTop.toSeq)
    assert(intTop.toSeq === Seq("tail", "hub", "mid"))
  }

  test("anchorTerms: inbound terms counted, self-links excluded, top-k by count") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      ("https://a.org/1",
        """<a href="https://b.org/x">great docs here</a>
          |<a href="https://b.org/y">great tutorials</a>
          |<a href="https://a.org/self">my own nav</a>""".stripMargin),
      ("https://c.net/2", """<a href="https://b.org/z">great reference</a>"""))
      .toDF("url", "html")
    val got = graft.pipeline.LinkGraph.anchorTerms(pages, "url", "html", topK = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // b.org inbound terms: great=3, docs=1, here=1, reference=1, tutorials=1
    // top-2: great (3), then docs (tie of 1s broken by term asc)
    assert(got.toSeq === Seq(("b.org", 1, "great", 3L), ("b.org", 2, "docs", 1L)))
  }

  test("domainEdges: hrefs normalize and collapse to distinct domain pairs") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      ("https://a.org/p/1",
        """<p>x</p><a href="HTTPS://WWW.B.org/page?utm_source=x">b</a>
          |<a href="https://b.org/other">b again</a>
          |<a href="https://sub.c.net/d">c</a>
          |<a href="https://a.org/self">self</a>""".stripMargin),
      ("https://b.org/p/2", """<a href="https://a.org/">back</a>"""))
      .toDF("url", "html")
    val edges = LinkGraph.domainEdges(pages, "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges === Set(("a.org", "b.org"), ("a.org", "c.net"), ("b.org", "a.org")))
  }
}
