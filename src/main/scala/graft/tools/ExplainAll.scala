package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries — the plan-review
  * surface: check PushedFilters, broadcast choices, and WholeStageCodegen
  * spans. `sbt "runMain graft.tools.ExplainAll [sfDir] [name...]"` */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // "all" dumps every registered query — the full-surface plan audit
    // (grep the output for CartesianProduct / BroadcastNestedLoopJoin /
    // missing PushedFilters)
    val names =
      if (args.length > 1 && args(1) == "all") graft.SparkEntry.queries.keySet
      else if (args.length > 1) args.drop(1).toSet else Set(
      "q_agg_lineitem", "q_filter_prefix", "q_join_revenue", "q_sort_limit",
      "q_join_filtered", "q_sessionize", "dedup_exact", "ann_topk",
      "dedup_exact_keep", "dedup_simhash_lsh", "emb_dup_lsh", "corpus_pack",
      "q_subquery", "q_grouping_sets", "q_salted_join",
      // round 3
      "q_asof_native", "dedup_substring", "dedup_incremental",
      "text_heavy_hitters", "q_upsert", "q_zorder_key", "q_profile",
      "q_cohort_retention", "text_segment_dedup", "text_bm25",
      // round 4
      "dedup_triangles", "dedup_simhash_lsh64", "q_upsert_mor",
      "q_sql_custom",
      // round 5
      "q_pii_redact", "dedup_canonical", "emb_dim_stats", "ann_pq",
      "q_iqr_outliers", "graph_pagerank", "q_zonemap_scan", "q_scd2",
      "dedup_containment", "text_winnow", "text_heavy_by_lang")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(q => names(q._1)).foreach {
      case (name, fn) =>
        println(s"\n========== $name ==========")
        val df = fn(spark, dir)
        df.explain("formatted")
        // simple mode too: its *(n) markers are the whole-stage-codegen
        // span ids — the formatted dump doesn't carry them
        println(s"---------- $name (simple, codegen spans) ----------")
        df.explain()
    }
    spark.stop()
  }
}
