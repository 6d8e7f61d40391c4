package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the Structured
  * Streaming face of the engine's A3/A4 group-sums (the reference's
  * daily/period rollups, dashboard.py:249-328, computed continuously
  * instead of per page load).
  *
  * The watermark bounds state: windows older than (max event time −
  * watermark) finalize and evict; later-arriving events for them drop.
  * Scale: state is one row per (window × event_type) — independent of
  * input volume — and partial aggregation happens before the stateful
  * store, so the shuffle carries pre-combined rows.
  */
object WindowedEventCounts {

  def windowedTotals(events: DataFrame, tsCol: String,
                     watermark: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("event_type"), col("n_events"), col("total_value"))
}
