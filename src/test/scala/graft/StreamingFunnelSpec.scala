package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, StageReached}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming funnel — monotone per-user stage frontier across
  * micro-batches; agreement with the batch funnel on in-order input.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(batches: Seq[Seq[FunnelEvent]]): Seq[(Long, Int, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val name = s"funnel_${System.nanoTime()}"
    val q = StreamingFunnel.stageProgress(spark, input.toDS(), stages)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[StageReached].collect()
        .map(r => (r.user_id, r.stage, r.ts)).sortBy(identity).toSeq
    } finally q.stop()
  }

  test("advances through stages across micro-batches, emitting each advancement once") {
    val out = run(Seq(
      Seq(FunnelEvent(1, "view", 10), FunnelEvent(1, "purchase", 12)),
      Seq(FunnelEvent(1, "click", 20), FunnelEvent(2, "view", 5)),
      Seq(FunnelEvent(1, "purchase", 30), FunnelEvent(1, "purchase", 40))))
    // purchase@12 precedes any click → ignored; purchase@30 lands after click@20;
    // purchase@40 is after the frontier is complete → no double emission
    assert(out == Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L), (2L, 1, 5L)))
  }

  test("intra-batch disorder is sorted out; frontier never rewinds across batches") {
    val inOrder = run(Seq(Seq(
      FunnelEvent(1, "click", 20), FunnelEvent(1, "view", 10))))
    assert(inOrder == Seq((1L, 1, 10L), (1L, 2, 20L))) // sorted within the batch
    val straggler = run(Seq(
      Seq(FunnelEvent(1, "view", 10)),
      Seq(FunnelEvent(1, "click", 8)))) // arrives late, BEFORE the view time
    assert(straggler == Seq((1L, 1, 10L))) // monotone frontier: not counted
  }

  test("single-batch stream agrees with the batch funnel stage times") {
    val evs = Seq(
      FunnelEvent(1, "view", 10), FunnelEvent(1, "click", 20),
      FunnelEvent(1, "purchase", 30), FunnelEvent(2, "purchase", 5),
      FunnelEvent(2, "view", 10), FunnelEvent(2, "click", 8),
      FunnelEvent(3, "click", 5),
      FunnelEvent(4, "view", 10), FunnelEvent(4, "click", 20),
      FunnelEvent(4, "purchase", 15))
    val streamed = run(Seq(evs))
      .groupBy(_._1).view.mapValues(_.map(s => s._2 -> s._3).toMap).toMap
    val batch = graft.operators.Analytics.funnel(
        evs.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages)
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).flatMap(i =>
          Option(r.get(i)).map(t => i -> t.asInstanceOf[Long])).toMap
      }.toMap
    assert(streamed == batch)
    graft.operators.OpCache.clear()
  }
}
