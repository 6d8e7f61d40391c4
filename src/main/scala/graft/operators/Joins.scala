package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operator pack — SURVEY.md §2.3.
  *
  * Join-strategy posture for 100 TB: dimensions (region/nation/customer-
  * scale sides) are explicitly `broadcast()`-hinted so the fact side never
  * shuffles; fact–fact joins rely on hash shuffle + AQE (skew split,
  * dynamic coalescing). Nothing here collects to the driver.
  */
object Joins {

  /** J1 — fact ⟕ small dimension, broadcast (ref: dashboard.py:287 period
    * movies ⟕ movie on movie_cd). The explicit hint keeps the plan a
    * BroadcastHashJoin even if stats are missing at 100 TB.
    */
  def broadcastLeft(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(Hints.bcast(dim), keys, "left")

  /** J2/J3 — anti join: rows of `left` whose key is absent from `right`
    * (ref: kobis_pipeline.py:77-81 insert-only-new; movie_events_scraper.py:79
    * NOT IN subquery). Spark plans broadcast-anti when `right` is small;
    * null-safe by construction (unlike SQL NOT IN with nulls).
    */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Semi join — EXISTS. Not in the reference (it only uses anti) but the
    * natural dual; used by the SQL surface.
    */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** J4 — enrichment with a fallback lookup (ref:
    * movie_events_scraper.py:307-367: goods events matched on key₁, the
    * misses retried on key₂, enriched columns coalesced; right side deduped
    * first for 1:1 semantics).
    *
    * Here: two left joins against key-deduped lookups, then per-column
    * `coalesce(primary, fallback)`. Both lookups broadcast when dim-sized;
    * two map-side joins, zero extra shuffles of the fact.
    *
    * @param enrich columns to carry over, name → (primary alias, fallback alias)
    */
  def enrichWithFallback(fact: DataFrame, primary: DataFrame, fallback: DataFrame,
                         keys: Seq[String], enrichCols: Seq[String]): DataFrame =
    enrichWithFallbackKeys(fact, primary, fallback, keys, keys, enrichCols)

  /** General form of J4: the reference retries its misses on a DIFFERENT
    * composite key (key₁ = title∥goods composite, key₂ = (title, start,
    * end) — movie_events_scraper.py:319-344). Both lookups are deduped on
    * their own key for 1:1 semantics and broadcast; per-column coalesce
    * prefers the primary hit.
    */
  def enrichWithFallbackKeys(fact: DataFrame, primary: DataFrame, fallback: DataFrame,
                             primaryKeys: Seq[String], fallbackKeys: Seq[String],
                             enrichCols: Seq[String]): DataFrame = {
    val p = primary.dropDuplicates(primaryKeys)
      .select((primaryKeys ++ enrichCols).map(col): _*)
      .toDF(primaryKeys ++ enrichCols.map(_ + "__p"): _*)
    val f = fallback.dropDuplicates(fallbackKeys)
      .select((fallbackKeys ++ enrichCols).map(col): _*)
      .toDF(fallbackKeys ++ enrichCols.map(_ + "__f"): _*)
    val joined = fact.join(Hints.bcast(p), primaryKeys, "left")
      .join(Hints.bcast(f), fallbackKeys, "left")
    enrichCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c + "__p"), col(c + "__f")))
        .drop(c + "__p", c + "__f")
    }
  }

  /** As-of join (the temporal-join operator Spark lacks natively): for
    * each probe row, attach the LATEST event row per key with
    * eventTime ≤ probeTime (left semantics — probes with no prior event
    * keep nulls).
    *
    * Shape: NOT a per-probe lookup join (that's a theta-join → O(probes ×
    * events-per-key) and unindexable in a shuffle engine). Both sides are
    * tagged and unioned, shuffled ONCE by key, and a single ordered window
    * pass carries the last event struct forward into each probe row —
    * O((|probes|+|events|) log) per key, the merge-sorted shape an as-of
    * join runs as on any 1000-executor cluster.
    *
    * Ordering inside a key: (time asc, events-before-probes at equal time
    * so "at-or-before" includes ties, tieBreak asc so the LAST tied event
    * wins deterministically).
    *
    * @param carryCols event columns attached to each probe row
    * @param tieBreak  deterministic order among events with equal time
    */
  def asOf(probes: DataFrame, events: DataFrame, keys: Seq[String],
           probeTimeCol: String, eventTimeCol: String,
           carryCols: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ev = events.select(
      keys.map(col) ++ Seq(col(eventTimeCol).cast("long").as("__t"),
        lit(1).as("__e"),
        struct(carryCols.map(col): _*).as("__c")) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")): _*)
    val pr = probes.select(
      keys.map(col) ++ Seq(col(probeTimeCol).cast("long").as("__t"),
        lit(0).as("__e"),
        lit(null).cast(ev.schema("__c").dataType).as("__c"),
        struct(probeCols.map(col): _*).as("__p")): _*)
    val tagged = ev.unionByName(pr, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__e").desc +:
        tieBreak.map(c => col(s"__tb_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__last", last(col("__c"), ignoreNulls = true).over(w))
      .filter(col("__e") === 0)
    carried.select(
      probeCols.map(c => col(s"__p.$c").as(c)) ++
        carryCols.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** [[asOf]]'s FORWARD dual — for each probe, the FIRST event
    * at-or-after its time ("next price tick" / "next maintenance
    * window" lookup). Same merge-sorted single-window shape, mirrored:
    * probes sort BEFORE events at equal time (at-or-after includes
    * ties), the frame looks forward, `first(ignoreNulls)` carries the
    * next event struct back, and the EARLIEST tied event wins via
    * ascending tie-break. Probes with no later event carry nulls.
    */
  def asOfForward(probes: DataFrame, events: DataFrame, keys: Seq[String],
                  probeTimeCol: String, eventTimeCol: String,
                  carryCols: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ev = events.select(
      keys.map(col) ++ Seq(col(eventTimeCol).cast("long").as("__t"),
        lit(1).as("__e"),
        struct(carryCols.map(col): _*).as("__c")) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")): _*)
    val pr = probes.select(
      keys.map(col) ++ Seq(col(probeTimeCol).cast("long").as("__t"),
        lit(0).as("__e"),
        lit(null).cast(ev.schema("__c").dataType).as("__c"),
        struct(probeCols.map(col): _*).as("__p")): _*)
    val tagged = ev.unionByName(pr, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__e").asc +:
        tieBreak.map(c => col(s"__tb_$c").asc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = tagged
      .withColumn("__next", first(col("__c"), ignoreNulls = true).over(w))
      .filter(col("__e") === 0)
    carried.select(
      probeCols.map(c => col(s"__p.$c").as(c)) ++
        carryCols.map(c => col(s"__next.$c").as(c)): _*)
  }

  /** Range (interval) join via bucket decomposition — the scale path for
    * `point BETWEEN lo AND hi` joins, which Spark would otherwise plan as
    * a broadcast-nested-loop over the full cross space.
    *
    * Every interval is exploded to the fixed-width buckets it overlaps;
    * every point lands in exactly ONE bucket, so the bucket equi-join
    * produces no duplicates and the residual BETWEEN filter just trims
    * bucket edges. Work is O(points + intervals·(span/width)) with a
    * shuffle keyed by bucket — pick `bucketWidth` near the typical
    * interval span so most intervals hit 1-2 buckets.
    *
    * Domain: point/lo/hi are non-negative longs (day numbers, epoch
    * micros) — integral division below truncates toward zero.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__b",
      explode(sequence(expr(s"CAST($loCol AS BIGINT) div $bucketWidth"),
                       expr(s"CAST($hiCol AS BIGINT) div $bucketWidth"))))
    val pt = points.withColumn("__b", expr(s"CAST($pointCol AS BIGINT) div $bucketWidth"))
    pt.join(iv, Seq("__b"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__b")
  }
}
