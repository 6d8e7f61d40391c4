package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST1 — incremental-watermark ingestion with gap backfill (ref:
  * kobis_pipeline.py:14-49: read MAX(target_dt); bootstrap 7 days when
  * empty; else resume at max+1; iterate day-by-day up to `asOf`).
  *
  * The reference loops day-by-day on the driver; here the missing-date
  * spine is a relational value — `sequence(watermark+1, asOf)` exploded —
  * so "which partitions to fetch" stays inside the plan and can drive a
  * partition-pruned source read. The watermark agg is a single scalar
  * aggregate (map-side max + one-row exchange), cheap at any scale.
  */
object Ingest {

  /** Missing-date spine: (max(dateCol)+1 .. asOf), or the `bootstrapDays`
    * window ending at `asOf` when the store is empty. `asOf` is injected
    * (never current_date()) so tests and backfills are reproducible —
    * SURVEY §7.5 timezone note.
    */
  def missingDates(store: DataFrame, dateCol: String, asOf: String,
                   bootstrapDays: Int = 7): DataFrame = {
    val asOfD = to_date(lit(asOf))
    val wm = store.agg(max(to_date(col(dateCol))).as("wm"))
    val start = coalesce(date_add(col("wm"), 1), date_sub(asOfD, bootstrapDays - 1))
    // sequence(start, stop) REVERSES when start > stop — an up-to-date
    // store must yield an empty spine, not a phantom descending one
    wm.select(
      explode(
        when(start <= asOfD, sequence(start, asOfD))
          .otherwise(expr("CAST(array() AS ARRAY<DATE>)"))).as("d"))
  }
}
