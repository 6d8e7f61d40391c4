package graft

import graft.streaming.LatestPerKeyStream
import graft.streaming.LatestPerKeyStream.StockObs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** ST4 — streaming latest-per-key over a MemoryStream, driven with
  * explicit micro-batches (the 10-minute poll cadence, compressed).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stream keeps the latest observation per (event, theater) across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StockObs]
    val q = LatestPerKeyStream.latestPerKey(spark, input.toDS())
      .writeStream.format("memory").queryName("latest_stock")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        StockObs("e1", "CGV강남", 100L, "보유", 50),
        StockObs("e1", "CGV강남", 200L, "소진중", 20),
        StockObs("e1", "용산", 100L, "보유", 44))
      q.processAllAvailable()
      val afterB1 = spark.table("latest_stock").as[StockObs].collect()
        .map(o => (o.theater_name, o.status)).toSet
      assert(afterB1 == Set(("CGV강남", "소진중"), ("용산", "보유")))

      // batch 2: newer obs for 강남, stale (older) obs for 용산 → only 강남 emits
      input.addData(
        StockObs("e1", "CGV강남", 300L, "소진", 0),
        StockObs("e1", "용산", 50L, "보유", 44))
      q.processAllAvailable()
      val all = spark.table("latest_stock").as[StockObs].collect()
      val emitted2 = all.filter(_.scraped_at > 200L)
      assert(emitted2.map(o => (o.theater_name, o.status)).toSeq == Seq(("CGV강남", "소진")))
      // the stale 용산 observation must NOT have produced an update
      assert(!all.exists(o => o.theater_name == "용산" && o.scraped_at == 50L))
    } finally q.stop()
  }
}
