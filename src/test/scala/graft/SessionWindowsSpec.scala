package graft

import graft.streaming.SessionWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class SessionWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window merges events within the gap and splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDS().toDF("ts", "user_id", "value")
    val q = SessionWindows.sessionTotals(df, "ts", "user_id", gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:05:00"), 1L, 2.0),  // within gap → same session
        (ts("2024-01-01 10:30:00"), 1L, 4.0),  // 25 min later → new session
        (ts("2024-01-01 10:02:00"), 2L, 8.0))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(out.contains((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00"), 2L, 3.0)))
      assert(out.contains((1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00"), 1L, 4.0)))
      assert(out.contains((2L, ts("2024-01-01 10:02:00"), ts("2024-01-01 10:12:00"), 1L, 8.0)))

      // a chain of bridge events (each within the gap of its neighbor)
      // merges the two user-1 sessions into one
      input.addData(
        (ts("2024-01-01 10:13:00"), 1L, 16.0),
        (ts("2024-01-01 10:22:00"), 1L, 32.0))
      q.processAllAvailable()
      val merged = spark.table("sessions")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .filter(_._1 == 1L)
      assert(merged.length == 1, s"expected one merged session, got: ${merged.toSeq}")
      assert(merged.head._4 == 5L && merged.head._5 == 55.0)
      assert(merged.head._2 == ts("2024-01-01 10:00:00")
        && merged.head._3 == ts("2024-01-01 10:40:00"))
    } finally q.stop()
  }
}
