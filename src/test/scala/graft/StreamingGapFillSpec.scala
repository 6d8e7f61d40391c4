package graft

import graft.streaming.StreamingGapFill
import graft.streaming.StreamingGapFill.{Filled, Obs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming LOCF gap fill — final append emissions, monotone per-key
  * frontier across micro-batches; agreement with the batch operator.
  */
class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Obs]]): Seq[(Long, Int, Double, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val name = s"gapfill_${System.nanoTime()}"
    val q = StreamingGapFill.filled(spark, input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Filled].collect()
        .map(r => (r.key, r.day, r.v, r.is_gap)).sortBy(t => (t._1, t._2)).toSeq
    } finally q.stop()
  }

  test("fills gaps with the carried value across micro-batches, each day emitted once") {
    val out = run(Seq(
      Seq(Obs(1, 10, 1.0)),
      Seq(Obs(1, 13, 4.0), Obs(2, 20, 7.0)), // 3-day gap closed by a later batch
      Seq(Obs(1, 14, 5.0))))                 // adjacent day: no gap rows
    assert(out == Seq(
      (1L, 10, 1.0, 0),
      (1L, 11, 1.0, 1), (1L, 12, 1.0, 1), // carried across the batch boundary
      (1L, 13, 4.0, 0),
      (1L, 14, 5.0, 0),
      (2L, 20, 7.0, 0)))
  }

  test("intra-batch disorder is sorted; a cross-batch straggler cannot rewind the frontier") {
    val inOrder = run(Seq(Seq(Obs(1, 12, 3.0), Obs(1, 10, 1.0))))
    assert(inOrder == Seq((1L, 10, 1.0, 0), (1L, 11, 1.0, 1), (1L, 12, 3.0, 0)))
    val straggler = run(Seq(
      Seq(Obs(1, 10, 1.0)),
      Seq(Obs(1, 8, 9.0)))) // late observation BEFORE the frontier: dropped
    assert(straggler == Seq((1L, 10, 1.0, 0)))
  }

  test("drained emissions equal the batch gapFillLocf spine") {
    val obs = Seq(Obs(1, 10, 1.0), Obs(1, 14, 2.0), Obs(1, 15, 3.0),
                  Obs(2, 12, 5.0), Obs(2, 16, 6.0))
    val streamed = run(Seq(obs.take(2), obs.drop(2)))
    val batchDf = obs.toDF()
      .select(col("key"), date_add(to_date(lit("1970-01-01")), col("day")).as("d"),
        col("v"))
    val batch = graft.operators.Analytics.gapFillLocf(batchDf, Seq("key"), "d", "v")
      .select(col("key"), datediff(col("d"), to_date(lit("1970-01-01"))).as("day"),
        col("v"), col("is_gap"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch)
  }
}
