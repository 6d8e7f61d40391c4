package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.IncrementalAgg

/** Continuously-maintained rollup store: each micro-batch is collapsed
  * to its mergeable per-key state ([[IncrementalAgg.aggregateBatch]])
  * and folded into a durable store ([[IncrementalAgg.merge]] +
  * crash-safe `AtomicStore` swap) — the streaming deployment of the
  * incremental materialized-view pattern, and the always-on form of the
  * reference's append-then-re-derive dashboard rollups.
  *
  * Why `foreachBatch` instead of a stateful streaming aggregation: the
  * store must be a QUERYABLE TABLE between batches (the dashboard reads
  * it), survive restarts without replaying the stream, and merge with
  * batch-side ingests — state-store aggregations keep their state
  * private to the query. The per-batch cost is one batch-sized
  * aggregation plus a merge that shuffles only STATE rows (one per key,
  * independent of how much history the store summarizes); the KMV
  * distinct sketch stays exactly mergeable across batches, so the
  * drained store is bit-identical to a one-shot aggregate over full
  * history — which is what the oracle checks. Replay safety (round-13
  * verdict #3): the fold goes through `AtomicStore.foldOnce` with the
  * micro-batch id as the ledger key — Spark re-delivers a failed batch
  * under the SAME id, so the retry is a ledger no-op and the store is
  * exactly-once with no external checkpoint-outlives-store discipline.
  * Read the store through `AtomicStore.readState` (the ledger markers
  * ride inside the table).
  */
object StreamingIncrementalAgg {

  def writer(spark: SparkSession, stream: DataFrame, storePath: String,
             keys: Seq[String], valueCol: String, distinctCol: String,
             k: Int): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.pipelines.AtomicStore.foldOnce(spark, storePath, s"mb_$batchId",
        IncrementalAgg.aggregateBatch(batch, keys, valueCol, distinctCol, k))(
        IncrementalAgg.merge(_, _, keys, k))
      ()
    }

  def start(spark: SparkSession, stream: DataFrame, storePath: String,
            keys: Seq[String], valueCol: String, distinctCol: String,
            k: Int, checkpoint: String): StreamingQuery =
    writer(spark, stream, storePath, keys, valueCol, distinctCol, k)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
