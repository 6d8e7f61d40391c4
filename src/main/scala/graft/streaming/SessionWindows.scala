package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap sessionization — the continuous face of
  * `Analytics.sessionize` (batch): `session_window` merges events whose
  * event times are within `gap` of each other into one growing window
  * per key; a session finalizes when the watermark passes its close.
  *
  * Scale shape: state is one open session row per active key — bounded
  * by key cardinality, not event volume — and Spark merges
  * overlapping/adjacent session candidates inside the state store, so
  * the shuffle is a single keyed exchange. This is the semantics the
  * reference's 10-minute stock-poll cadence would need to sessionize
  * theater activity live (goods_stock_pipeline.py:135-140 polling into
  * dashboard "current state" reads).
  */
object SessionWindows {

  /** Per-(key, session) rollup: session start/end, event count, value
    * total. `gap` is a duration string like "4 hours"; `valueCol` names
    * the measure to total (parameterized like the other columns — a
    * hardcoded name would fail analysis on any differently-shaped
    * stream).
    */
  def sessionTotals(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: String = "30 minutes",
                    valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(keyCol),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("total_value"))
}
