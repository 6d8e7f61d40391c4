package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental dual of
  * [[graft.operators.Dedup.exactCanonical]] for an append-only document
  * feed (the shape an LLM-ingest pipeline runs: documents stream in,
  * only first-seen content may pass downstream).
  *
  * Two variants, both one-row-of-state per distinct key:
  *
  *   - [[firstSeen]]: `dropDuplicates` on the content hash with NO
  *     watermark — exact forever, state grows with distinct corpus size
  *     (what exact global dedup costs in ANY engine; at 100 TB the state
  *     store backend — RocksDB in production — holds hash→seen, sized by
  *     distinct hashes, not by stream length).
  *   - [[firstSeenWithin]]: `dropDuplicatesWithinWatermark` — duplicates
  *     are only suppressed within the event-time watermark horizon, so
  *     state is BOUNDED by the horizon and late replays past it
  *     re-admit a row (the deliberate exactness↔state trade; matches the
  *     reference's at-least-once re-scrape tolerance).
  *
  * Keying on `md5(text)` rather than the text keeps state entries small
  * (16 bytes vs document size) — same canonical-hash convention as the
  * batch operator.
  */
object StreamingDedup {

  /** Exact first-seen filter on content hash (unbounded state). */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .dropDuplicates("content_hash")

  /** Watermark-bounded first-seen filter: suppresses duplicates arriving
    * within `horizon` of the original (event-time `tsCol` must be a
    * timestamp column); state for hashes older than the watermark is
    * dropped.
    */
  def firstSeenWithin(docs: DataFrame, textCol: String,
                      tsCol: String, horizon: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
