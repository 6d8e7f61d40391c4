package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup — first-seen semantics across micro-batches,
  * and watermark-bounded state for the within-horizon variant.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def doc(id: Long, sec: Long, text: String) =
    Doc(id, new java.sql.Timestamp(sec * 1000), text)

  test("firstSeen admits each distinct text once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.firstSeen(input.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_seen")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(1, 10, "alpha"), doc(2, 11, "beta"), doc(3, 12, "alpha"))
      q.processAllAvailable()
      // duplicate of "alpha" in a LATER batch must also be suppressed
      input.addData(doc(4, 20, "alpha"), doc(5, 21, "gamma"))
      q.processAllAvailable()
      val ids = spark.table("dedup_seen").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 5L)) // one row per distinct text, first seen wins
    } finally q.stop()
  }

  test("firstSeenWithin suppresses duplicates inside the horizon, readmits beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.firstSeenWithin(input.toDF(), "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(1, 100, "alpha"), doc(2, 105, "alpha"))
      q.processAllAvailable()
      // advance event time far past the horizon, then replay the same text:
      // its state has expired, so the replay is re-admitted
      input.addData(doc(3, 1000, "advance"))
      q.processAllAvailable()
      input.addData(doc(4, 995, "alpha")) // above the 990 watermark (not late), far past alpha's expired state
      q.processAllAvailable()
      val ids = spark.table("dedup_wm").select("doc_id").as[Long].collect().sorted
      assert(ids.contains(1L) && !ids.contains(2L), s"in-horizon dup must drop: ${ids.toSeq}")
      assert(ids.contains(4L), s"replay past the watermark horizon re-admits: ${ids.toSeq}")
    } finally q.stop()
  }
}
