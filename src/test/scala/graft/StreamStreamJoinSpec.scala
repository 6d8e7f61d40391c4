package graft

import graft.streaming.StreamStreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join pairs within the window across batches; outside-window misses") {
    implicit val sqlCtx = spark.sqlContext
    // both sides carry a same-named non-key column (`kind`) — the normal
    // attribution shape; the join must suffix it, not leave it ambiguous
    val views = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, String)]
    val joined = StreamStreamJoin.intervalJoin(
      views.toDS().toDF("ts", "user_id", "kind"),
      buys.toDS().toDF("ts", "user_id", "kind"),
      keyCol = "user_id", tsCol = "ts",
      within = "10 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: views only — no output yet
      views.addData((ts("2024-01-01 10:00:00"), 1L, "view"),
        (ts("2024-01-01 10:00:00"), 2L, "view"))
      q.processAllAvailable()
      assert(spark.table("attributed").count() == 0)

      // batch 2: purchases — user 1 inside the 10-min window, user 2 outside,
      // user 3 has no view
      buys.addData(
        (ts("2024-01-01 10:07:00"), 1L, "buy"),
        (ts("2024-01-01 10:20:00"), 2L, "buy"),
        (ts("2024-01-01 10:01:00"), 3L, "buy"))
      q.processAllAvailable()
      // name-keyed select works because the right side is fully suffixed
      val out = spark.table("attributed")
        .select("user_id", "ts", "ts_r", "kind", "kind_r")
        .as[(Long, Timestamp, Timestamp, String, String)].collect().toSet
      assert(out == Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:07:00"), "view", "buy")))

      // a purchase BEFORE the view never matches (r.ts >= l.ts)
      views.addData((ts("2024-01-01 10:30:00"), 4L, "view"))
      buys.addData((ts("2024-01-01 10:25:00"), 4L, "buy"))
      q.processAllAvailable()
      assert(spark.table("attributed").filter($"user_id" === 4L).count() == 0)
    } finally q.stop()
  }

  test("interval join rejects suffix collisions instead of producing duplicate names") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Timestamp, Long, String)].toDS().toDF("ts", "user_id", "kind")
    // right side already has kind AND kind_r: suffixing kind → two kind_r
    val rDup = MemoryStream[(Timestamp, Long, String, String)].toDS()
      .toDF("ts", "user_id", "kind", "kind_r")
    val e = intercept[IllegalArgumentException](StreamStreamJoin.intervalJoin(
      l, rDup, keyCol = "user_id", tsCol = "ts",
      within = "10 minutes", watermark = "5 minutes"))
    assert(e.getMessage.contains("kind_r"))
    // left already has ts_r: the renamed right ts collides cross-side
    val lDup = MemoryStream[(Timestamp, Timestamp, Long)].toDS()
      .toDF("ts", "ts_r", "user_id")
    val r = MemoryStream[(Timestamp, Long)].toDS().toDF("ts", "user_id")
    val e2 = intercept[IllegalArgumentException](StreamStreamJoin.intervalJoin(
      lDup, r, keyCol = "user_id", tsCol = "ts",
      within = "10 minutes", watermark = "5 minutes"))
    assert(e2.getMessage.contains("ts_r"))
  }

  test("left-outer interval join emits unattributed rows with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val q = StreamStreamJoin.intervalJoinLeftOuter(
        views.toDS().toDF("ts", "user_id"), buys.toDS().toDF("ts", "user_id"),
        "user_id", "ts", within = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("unattributed")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 converts in-window; user 2 never does
      views.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
      buys.addData((ts("2024-01-01 10:07:00"), 1L))
      q.processAllAvailable()
      // advance BOTH sides' event time far past 10:00 + within + delay so
      // the global watermark closes user 2's match window, then let the
      // next micro-batch evict and emit the outer row
      views.addData((ts("2024-01-01 11:00:00"), 9L))
      buys.addData((ts("2024-01-01 11:00:00"), 9L))
      q.processAllAvailable()
      views.addData((ts("2024-01-01 11:30:00"), 9L))
      buys.addData((ts("2024-01-01 11:30:00"), 9L))
      q.processAllAvailable()
      val out = spark.table("unattributed")
        .select("user_id", "ts", "ts_r")
        .as[(Long, Timestamp, Option[Timestamp])].collect().toSet
      assert(out.contains((1L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:07:00")))))
      assert(out.contains((2L, ts("2024-01-01 10:00:00"), None)),
        s"expected an unattributed null row for user 2, got: $out")
    } finally q.stop()
  }

  test("streaming interval join agrees with the equivalent batch join") {
    implicit val sqlCtx = spark.sqlContext
    val viewRows = Seq(
      (ts("2024-01-01 09:00:00"), 1L), (ts("2024-01-01 09:30:00"), 1L),
      (ts("2024-01-01 09:10:00"), 2L))
    val buyRows = Seq(
      (ts("2024-01-01 09:05:00"), 1L), (ts("2024-01-01 09:35:00"), 1L),
      (ts("2024-01-01 09:45:00"), 2L))

    val views = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val q = StreamStreamJoin.intervalJoin(
        views.toDS().toDF("ts", "user_id"), buys.toDS().toDF("ts", "user_id"),
        "user_id", "ts", within = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("ssj_batch_parity")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(viewRows: _*); buys.addData(buyRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_batch_parity")
        .select("user_id", "ts", "ts_r").as[(Long, Timestamp, Timestamp)]
        .collect().toSet

      val batch = StreamStreamJoin.intervalJoin(
          viewRows.toDF("ts", "user_id"), buyRows.toDF("ts", "user_id"),
          "user_id", "ts", within = "10 minutes", watermark = "5 minutes")
        .select("user_id", "ts", "ts_r").as[(Long, Timestamp, Timestamp)]
        .collect().toSet
      assert(streamed == batch)
      // 09:00 view → 09:05 buy; 09:30 view → 09:35 buy; user-2 buy at
      // 09:45 is 35 min after its view → dropped
      assert(batch == Set(
        (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:05:00")),
        (1L, ts("2024-01-01 09:30:00"), ts("2024-01-01 09:35:00"))))
    } finally q.stop()
  }
}
