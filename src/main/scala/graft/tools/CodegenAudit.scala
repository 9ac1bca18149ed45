package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: execute selected SparkEntry queries and print each
  * WholeStageCodegen subtree of the FINAL (post-AQE) physical plan —
  * the codegen-span evidence `explain("formatted")` on an unexecuted
  * adaptive plan cannot show. Generated Java bodies are omitted; the
  * subtree shapes are what the plan audit needs. */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = args(0).split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.warmup(spark, sfDir) catch { case _: Throwable => }
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count() // finalize the adaptive plan
      println(s"========== $name ==========")
      val subtrees = org.apache.spark.sql.execution.debug
        .codegenStringSeq(df.queryExecution.executedPlan)
      println(s"Found ${subtrees.size} WholeStageCodegen subtrees.")
      val bodies = sys.env.get("CODEGEN_AUDIT_BODIES").contains("1")
      subtrees.zipWithIndex.foreach { case ((subtree, code, _), i) =>
        println(s"== Subtree ${i + 1} / ${subtrees.size} ==")
        println(subtree.trim)
        if (bodies) { println("-- generated --"); println(code) }
      }
    }
    spark.stop()
  }
}
