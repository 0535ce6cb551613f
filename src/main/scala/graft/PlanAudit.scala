package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for representative queries and grep
  * the properties that matter at scale — parquet pushdown, pruned read
  * schemas, broadcast joins on dims, whole-stage codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("q01_scan_filter_project", "q04_agg_groupby",
      "q11_join_chain", "q13_band_pairs", "q14_interval_join",
      "q17_scd2_apply", "q32_cosine_topk", "q51_sketches_portable",
      "q70_interval_overlap", "q74_curation_funnel", "q75_typicality",
      "q84_weighted_sample", "q89_global_shuffle", "q94_segment_dedup",
      "q98_hard_negatives", "q104_pagerank", "q115_cc_labelprop",
      "q123_vocab_coverage", "q144_abc_classes", "q152_ks_stat")
    for (name <- interesting) {
      println(s"\n======== $name ========")
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      // keep the output grep-friendly but complete enough to audit
      println(plan)
    }
    spark.stop()
  }
}
