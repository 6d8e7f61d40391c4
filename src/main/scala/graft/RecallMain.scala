package graft

import org.apache.spark.sql.SparkSession

/** Standalone entry for the bench-reported ANN quality metric
  * ([[Bench.ivfPqRecallAt10]]) — lets a tuning session or the SCALE.md
  * notes re-measure recall at any sf dir without paying a full bench
  * sweep: `runMain graft.RecallMain /root/testdata/sf0.1`.
  */
object RecallMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Seq(nCells, nProbe, m, ksub, rerank) =
      (args.drop(1).map(_.toInt) ++ Seq(16, 8, 16, 16, 100).drop(args.length - 1)).take(5).toSeq
    println(f"ADC_PLAIN_RECALL_AT10=${Bench.ivfPqAdcRecallAt10(spark, sfDir, residual = false, nCells, nProbe, m, ksub)}%.4f")
    println(f"ADC_RESIDUAL_RECALL_AT10=${Bench.ivfPqAdcRecallAt10(spark, sfDir, residual = true, nCells, nProbe, m, ksub)}%.4f")
    println(f"IVFPQ_RECALL_AT10=${Bench.ivfPqRecallAt10(spark, sfDir, nCells, nProbe, m, ksub, rerank)}%.4f" +
      s" (nCells=$nCells nProbe=$nProbe m=$m ksub=$ksub rerank=$rerank)")
    println(f"IVFPQ_RESIDUAL_RERANK_RECALL_AT10=${Bench.ivfPqResidualRecallAt10(spark, sfDir, nCells, nProbe, m, ksub, rerank)}%.4f")
    println(f"ADC_OPQ_RECALL_AT10=${Bench.opqAdcRecallAt10(spark, sfDir, nCells, nProbe, m, ksub)}%.4f")
    println(f"IVFPQ_OPQ_RERANK_RECALL_AT10=${Bench.opqRerankRecallAt10(spark, sfDir, nCells, nProbe, m, ksub, rerank)}%.4f")
    spark.stop()
  }
}
