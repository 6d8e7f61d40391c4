package graft.operators

import org.apache.spark.sql.DataFrame
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
    fact.join(broadcast(dim), keys, "left")

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
    val joined = fact.join(broadcast(p), primaryKeys, "left")
      .join(broadcast(f), fallbackKeys, "left")
    enrichCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c + "__p"), col(c + "__f")))
        .drop(c + "__p", c + "__f")
    }
  }
}
