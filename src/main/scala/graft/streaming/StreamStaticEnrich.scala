package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Hints

/** Stream-static join enrichment — the streaming face of J1 (broadcast
  * dimension rollup): a fact STREAM continuously joined against a batch
  * dimension snapshot, then aggregated.
  *
  * This is the standard Structured Streaming pattern for dimension
  * enrichment (stream-static equi-joins are STATELESS: no watermark, no
  * state store — each micro-batch plans a fresh batch join against the
  * static side, so a dim small enough to broadcast never shuffles the
  * stream). Snapshot semantics follow Spark's: the static plan is
  * re-executed per micro-batch, so a dim TABLE that changes between
  * batches is picked up, but there is no point-in-time versioning — a
  * slowly-changing dim needs the SCD2 operator on the batch side
  * (q_scd2_versions) instead.
  *
  * Scale: the join inherits the library's conf-gated broadcast hint
  * ([[graft.operators.Hints.bcast]]); with hints off it degrades to a
  * shuffle join exactly like the batch J1 path. The aggregation state
  * (complete-mode totals) is one row per (segment × event_type) —
  * independent of stream volume.
  */
object StreamStaticEnrich {

  /** (segment, event_type, n_events, total_value) running totals of a
    * stream enriched by an equi-join on `eventKey` = `dimKey`.
    */
  def enrichedTotals(events: DataFrame, dim: DataFrame,
                     eventKey: String, dimKey: String,
                     segCol: String): DataFrame =
    events.join(
        Hints.bcast(dim.select(col(dimKey).as(eventKey), col(segCol))),
        Seq(eventKey))
      .groupBy(col(segCol), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("total_value"))
}
