package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the remaining Structured
  * Streaming join shape the engine's stream pack needs: correlate two
  * live event feeds by key within an event-time window (attribution,
  * click-to-purchase, sensor pairing), with state bounded by watermarks
  * on BOTH sides.
  *
  * Semantics: (left l, right r) pairs with l.key = r.key and
  * r.ts ∈ [l.ts, l.ts + within]. The time-range predicate is what lets
  * Spark expire state: left rows older than `watermark + within` and
  * right rows older than `watermark` can never match again and are
  * evicted from the state store — without the range condition the join
  * state grows without bound (Spark rejects an append-mode stream-stream
  * join lacking it). This is the streaming dual of the batch
  * `Analytics.funnel` adjacency: funnel finds ANY later stage hit;
  * the interval join demands it within a deadline.
  *
  * Scale: one keyed exchange per side into the join's state store
  * (co-partitioned by key), state per key bounded by in-window rows ×
  * watermark delay. Same posture as a 1000-executor attribution job.
  */
object StreamStreamJoin {

  /** Left events paired with right events (same `keyCol`) that occur in
    * [left.ts, left.ts + within]. Column names: left keeps its names;
    * EVERY right column except the (dropped) join key comes back
    * suffixed `_r` — the two sides of an attribution join usually share
    * a schema, and an unsuffixed survivor would make every name-keyed
    * select/sink ambiguous (round-3 review). `within` / `watermark` are
    * duration strings ("10 minutes").
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   within: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    // the output contract drops the RIGHT key (the left one survives);
    // under right/full outer joins the right key is the only non-null
    // one on unmatched rows, so those join types would emit keyless rows
    // — reject them rather than produce unusable output
    require(Set("inner", "leftouter", "left").contains(
        joinType.toLowerCase.replace("_", "")),
      s"intervalJoin supports inner/left_outer, got $joinType")
    // the _r suffixing exists to prevent ambiguous names — but it can
    // CREATE them: a right side already holding both `foo` and `foo_r`
    // makes `foo`'s new name ambiguous with the original `foo_r` (the
    // sequential rename then cascades it to `foo_r_r`, silently shifting
    // which column a name-keyed select reads), and a left `foo_r`
    // collides with the renamed right `foo`. Fail loudly instead (the
    // zorderWrite __z convention), naming the offenders: a suffix target
    // may match neither an existing right column nor a left column.
    val targets = right.columns.filter(_ != keyCol).map(c => s"${c}_r")
    val selfClash = targets.intersect(right.columns)
    require(selfClash.isEmpty,
      s"intervalJoin: _r suffixing collides with existing right columns " +
        s"${selfClash.mkString(", ")} — rename before joining")
    val crossClash = targets.intersect(left.columns)
    require(crossClash.isEmpty,
      s"intervalJoin: suffixed right columns collide with left columns " +
        s"${crossClash.mkString(", ")} — rename before joining")
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.columns.foldLeft(right) { (d, c) =>
        if (c == keyCol) d else d.withColumnRenamed(c, s"${c}_r")
      }
      .withWatermark(s"${tsCol}_r", watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.${tsCol}_r") >= col(s"l.$tsCol") &&
        col(s"r.${tsCol}_r") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"),
      joinType)
      .drop(col(s"r.$keyCol"))
  }

  /** Left-outer face of [[intervalJoin]] — the "unattributed" report: a
    * left row with NO in-window right match is emitted with null right
    * columns once the watermark passes the end of its match window
    * (before that the match could still arrive, so outer results are
    * inherently watermark-delayed — the semantics only a stream-stream
    * OUTER join exercises; inner matches still emit immediately).
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            keyCol: String, tsCol: String,
                            within: String, watermark: String): DataFrame =
    intervalJoin(left, right, keyCol, tsCol, within, watermark, "left_outer")
}
