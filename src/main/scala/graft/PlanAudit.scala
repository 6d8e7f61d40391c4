package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_decontaminate", "q_text_tfidf", "q_sample_stratified", "q_text_redact",
                  "q_sim_ivf_topk", "q_dedup_incremental_stored",
                  "q_profile_columns", "q_text_unigram_ce", "q_zscore_group",
                  "q_dedup_containment", "q_zorder_key", "q_dedup_jaccard_capped",
                  "q_dedup_semantic", "q_sample_weighted", "q_text_divergence")) {
      val df = SparkEntry.queries(q)(spark, dir)
      println(s"==== $q ====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast")
          || l.contains("Scan parquet") || l.contains("PushedFilters")
          || l.contains("WholeStageCodegen") || l.startsWith("(")).take(40).mkString("\n"))
      graft.operators.OpCache.clear()
    }
    spark.stop()
  }
}
