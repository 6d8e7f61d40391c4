package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** U1 — merge/upsert on plain parquet (ref: sqlite_connector.py:76-114
  * `INSERT … ON CONFLICT(key) DO UPDATE`; supabase_connector.py:26-85
  * upserts on movie_cd / (movie_cd,target_dt) / event_id /
  * (event_id,theater_name,scraped_at)).
  *
  * Parquet has no MERGE, so the engine's upsert is:
  *   union(new, old) → row_number over (partition by keys, order by
  *   priority desc, version desc) → keep rn=1 → (caller overwrites store).
  *
  * Scale: one shuffle on the conflict keys — the same cost as any MERGE's
  * join phase. On a real table you'd pair this with partitioned storage and
  * `partitionOverwriteMode=dynamic` so only touched partitions rewrite
  * (ref backfill semantics, SURVEY §2.1 S13); re-runs are idempotent
  * because last-write-wins is deterministic.
  */
object Upsert {

  /** Merge `fresh` into `base` on `keys`; among duplicate keys, highest
    * (isFresh, version) wins — i.e. a fresh row beats any base row
    * (ON CONFLICT DO UPDATE), and within a source the larger `version`
    * (e.g. scraped_at) wins. Deterministic given (keys, version) unique
    * per source.
    */
  def upsert(base: DataFrame, fresh: DataFrame, keys: Seq[String], version: Column): DataFrame = {
    val tagged = fresh.withColumn("__is_fresh", lit(1))
      .unionByName(base.withColumn("__is_fresh", lit(0)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__is_fresh").desc, version.desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__is_fresh")
  }
}
