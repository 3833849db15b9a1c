package graft

import org.apache.spark.sql.SparkSession

/** Regenerates docs/plans/headline_plans.txt — the formatted physical
  * plans of the headline queries the per-round plan audit reads. Test
  * scope (it is tooling, not product), run with:
  *   sbt "Test/runMain graft.PlanDump [outFile]"
  * A maintained main beats a scratch REPL session: `typedLit` inside
  * compiled operators trips a REPL-only literal-conversion quirk, so
  * console-driven explains crash on every two-phase-window query. */
object PlanDump {
  val headline: Seq[String] = Seq(
    "q09_monthly_report", "q26_fact_build", "q24_ngram_jaccard_pairs",
    "q23_embedding_neardup", "q25_ann_lsh", "q42_ann_ivf",
    "q43_curated_corpus", "q44_contamination", "q47_dup_components",
    "q48_ann_ivf_kmeans", "q50_curation_lsh", "q53_label_centroids",
    "q54_scd2_history", "q55_fuzzy_join", "q56_range_join",
    "q57_grouped_topk", "q58_semantic_dedup", "q59_shared_shingles",
    "q60_sequence_pack", "q61_curation_funnel", "q64_incremental_pairs",
    "q65_knn_graph", "q67_dataset_build",
    "q70_lm_quality", "q71_token_mixture", "q72_jsonl_roundtrip")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/plans/headline_plans.txt")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      sb ++= s"========== $name ==========\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sb.toString)
    println(s"[plandump] wrote ${headline.size} plans to $out")
    spark.stop()
  }
}
