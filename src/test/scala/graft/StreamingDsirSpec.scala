package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextAnalysis
import graft.streaming.StreamingDsir

/** Streaming DSIR scoring: multi-batch agreement with the instance-level
  * batch dual, statelessness of the model join, and the within-batch
  * completeness of each doc's aggregate.
  */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streamed scores equal the instance-level batch dual; model join is stateless") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "a b", "en"), (2L, "c d a", "fr"),
      (3L, "a a b", "en"), (4L, "b c", "fr")).toDF("doc_id", "text", "lang")
    val en = col("lang") === "en"
    val model = TextAnalysis.dsirModel(corpus, corpus.where(en), "text", buckets = 32)

    // the instance-level batch dual: per-feature lnr quantized per
    // INSTANCE (what the single-agg streaming plan computes), not the
    // batch scorer's per-bucket tf·lnr
    val expected = TextAnalysis
      .dsirFeatBuckets(corpus, col("doc_id"), "text", 32)
      .join(TextAnalysis.dsirLnr(model, 32), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(graft.Tables.dec(col("__lnr"))).cast("double"), 6)
          .as("dsir_log_weight"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingDsir.scored(
        input.toDS().toDF("doc_id", "text", "lang"), model,
        "doc_id", "text", buckets = 32)
      .writeStream.format("memory").queryName("sdsir")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData((1L, "a b", "en"), (2L, "c d a", "fr"))
      q.processAllAvailable()
      input.addData((3L, "a a b", "en"), (4L, "b c", "fr"))
      q.processAllAvailable()
      val got = spark.table("sdsir").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expected, s"got $got expected $expected")
      // the stream-static model join is stateless: the complete-mode
      // aggregation is the query's ONLY stateful operator
      val stateOps = q.lastProgress.stateOperators
      assert(stateOps.length == 1,
        s"expected exactly the aggregation state operator, got " +
          stateOps.map(_.operatorName).mkString(","))
    } finally q.stop()
  }
}
