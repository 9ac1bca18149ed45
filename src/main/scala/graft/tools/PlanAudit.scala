package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of selected SparkEntry queries: verifies
  * pushdown (PushedFilters/ReadSchema), broadcast choices and codegen spans
  * survive at the bench scale factor. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("cond_equal", "cond_like", "join_enrich", "scan_point_get",
        "sim_topk", "dedup_exact", "store_pruned_scan",
        "decon_ngram", "dedup_semantic", "pipeline_pack", "sim_pq",
        "source_quality", "pipeline_curation2",
        "agg_salted", "sim_knn", "dedup_spans", "pipeline_report",
        "search_keyword", "pipeline_mixing", "decon_bloom", "stats_quantiles",
        "pipeline_group_cap", "stats_top_tokens", "decon_report", "text_boilerplate",
        "url_normalize", "url_dedup", "url_domain_cap", "dsir_votes",
        "dedup_incremental", "text_chunks", "events_sessionize",
        "pipeline_leak_split", "events_transitions", "join_asof",
        "join_range", "stats_kmv", "events_funnel", "pipeline_shards",
        "multimodal_resize", "multimodal_audio", "join_interval",
        "pipeline_export", "emb_quantize", "sim_quantized", "text_html",
        "dedup_image", "multimodal_segments",
        "graph_pagerank", "emb_outliers", "sim_projected", "text_c4_rules",
        "pipeline_epochs", "graph_anchor_terms", "events_rolling",
        "decon_canary", "stats_topk_sketch", "pipeline_pack_binned", "dedup_winnow", "scan_multiget_weak",
        "stats_quantile_sketch", "source_warc_roundtrip", "store_zorder_scan",
        "search_phrase", "store_optimize_scan", "store_merge_scan",
        "catalog_analyze", "store_snapshot_scan", "url_rules",
        "sim_recall_lsh", "sim_recall_ivfpq", "pipeline_curation3",
        "dedup_threshold_sweep")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.warmup(spark, sfDir) catch { case _: Throwable => }
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
