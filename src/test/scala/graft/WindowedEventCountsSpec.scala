package graft

import graft.streaming.WindowedEventCounts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class WindowedEventCountsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed totals aggregate per hour; watermark drops too-late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDS().toDF("ts", "event_type", "value")
    val q = WindowedEventCounts.windowedTotals(df, "ts")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:50:00"), "view", 5.0))
      q.processAllAvailable()
      val b1 = spark.table("win_counts")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(b1.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(b1.contains((ts("2024-01-01 10:00:00"), "view", 1L, 5.0)))

      // advance event time far past the watermark, then send a very late
      // event for the 10:00 window — state for it is gone; the late row
      // must not reopen the finalized window
      input.addData((ts("2024-01-01 13:00:00"), "click", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:10:00"), "click", 100.0))
      q.processAllAvailable()
      val clicks10 = spark.table("win_counts")
        .as[(Timestamp, String, Long, Double)].collect()
        .filter(r => r._1 == ts("2024-01-01 10:00:00") && r._2 == "click")
      assert(clicks10.forall(_._4 <= 3.0), s"late event leaked: ${clicks10.toSeq}")
    } finally q.stop()
  }
}
