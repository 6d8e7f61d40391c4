package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamStaticEnrich

/** Stream-static join enrichment: batch agreement across multiple
  * micro-batches, statelessness of the join (only the complete-mode agg
  * carries state), and inner-join drop of unmatched stream keys.
  */
class StreamStaticEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch stream-static join totals equal the batch join+agg; unmatched keys drop") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("k", "seg")
    val input = MemoryStream[(Long, String, Double)]
    val q = StreamStaticEnrich.enrichedTotals(
        input.toDS().toDF("user_id", "event_type", "value"),
        dim, "user_id", "k", "seg")
      .writeStream.format("memory").queryName("sse")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData((1L, "view", 1.0), (2L, "view", 2.0), (99L, "view", 50.0))
      q.processAllAvailable()
      input.addData((3L, "view", 4.0), (1L, "click", 8.0))
      q.processAllAvailable()
      val got = spark.table("sse").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      // user 99 has no dim row: inner join drops it in BOTH batches
      assert(got == Map(
        ("A", "view") -> (2L, 5.0), ("B", "view") -> (1L, 2.0),
        ("A", "click") -> (1L, 8.0)), s"got $got")
      // stream-static join is stateless — the ONLY stateful operator in
      // the query is the complete-mode aggregation
      // (the aggregation surfaces as "stateStoreSave" in progress; a
      // stateful JOIN would add symmetric-hash-join operators)
      val stateOps = q.lastProgress.stateOperators
      assert(stateOps.length == 1,
        s"expected exactly the aggregation state operator, got " +
          stateOps.map(_.operatorName).mkString(","))
    } finally q.stop()
  }
}
