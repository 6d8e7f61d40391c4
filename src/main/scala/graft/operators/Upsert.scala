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

  /** U2 — CDC merge with tombstones: apply a change feed carrying an op
    * column ('I'/'U'/'D') to the store. The LATEST change per key (by
    * `seqCol`, change rows beating store rows at any sequence) decides
    * the outcome: I/U materialize the change row, D deletes the key —
    * the delete the plain [[upsert]] cannot express, and the contract a
    * Debezium-style feed needs. Same single key-shuffle window shape;
    * re-applying the same feed is a no-op (last-write-wins is
    * deterministic), and out-of-order feed rows resolve by sequence,
    * not arrival. The store side needs no op/seq columns — they are
    * tagged in (op 'I', seq −∞).
    */
  /** SCD-2 history FROM the CDC feed — [[applyCdc]] keeps the net
    * state; this keeps every version: each non-delete change opens an
    * interval [seq, next-change-seq) in the sequence domain, a
    * tombstone CLOSES its predecessor's interval without opening one
    * (the lead() sees the D's sequence, the D row itself is dropped),
    * and `is_current` marks the still-open versions. One key shuffle,
    * one window — the [[graft.operators.Analytics.scd2Intervals]]
    * shape extended with delete semantics.
    */
  def scd2FromCdc(changes: DataFrame, keys: Seq[String],
                  opCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).asc)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol, seqCol)
  }

  /** Feed contract: (keys, seqCol) SHOULD be unique per feed — a log
    * assigns one sequence per change. If a malformed feed carries two
    * ops for one key at one sequence, the outcome is still
    * deterministic (round-8 advice): the tie-break prefers the stronger
    * statement D > U > I, and — round-9 advice — two rows with the SAME
    * op but different payloads resolve by payload hash, so the survivor
    * is a pure function of the feed's contents, never of
    * partitioning/arrival order.
    */
  def applyCdc(store: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String, seqCol: String): DataFrame = {
    val tagged = changes.withColumn("__is_fresh", lit(1))
      .unionByName(
        store.withColumn(opCol, lit("I"))
          .withColumn(seqCol, lit(Long.MinValue))
          .withColumn("__is_fresh", lit(0)),
        allowMissingColumns = true)
    val opRank = when(col(opCol) === "D", 2)
      .when(col(opCol) === "U", 1).otherwise(0)
    val payloadCols = tagged.columns
      .filterNot((keys ++ Seq(opCol, seqCol, "__is_fresh")).contains)
    val payloadHash =
      if (payloadCols.isEmpty) lit(0L)
      else xxhash64(payloadCols.toIndexedSeq.map(c => col(c).cast("string")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__is_fresh").desc, opRank.desc,
        payloadHash.desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", "__is_fresh", opCol, seqCol)
  }
}
