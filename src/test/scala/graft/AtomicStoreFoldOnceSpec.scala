package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipelines.AtomicStore

/** The generic exactly-once fold helper (round-13 verdict #3): the
  * processed-batch ledger rides INSIDE the state table, one atomic swap
  * commits state+ledger together, re-delivered batch ids are no-ops.
  * The sketch/rollup sinks exercise it through their own oracles; this
  * spec pins the helper's OWN contract with a plain keyed-sum merge.
  */
class AtomicStoreFoldOnceSpec extends SparkSpec {
  import spark.implicits._

  private def store() =
    Files.createTempDirectory("foldonce_spec_").toString + "/store"

  private def delta(rows: (String, Long)*) = rows.toDF("k", "n")

  private def mergeSum(state: org.apache.spark.sql.DataFrame,
                       d: org.apache.spark.sql.DataFrame) =
    state.unionByName(d).groupBy("k").agg(sum("n").as("n"))

  test("folds accumulate; a re-delivered batch id is a no-op; readState hides markers") {
    val path = store()
    assert(AtomicStore.foldOnce(spark, path, "b1", delta("a" -> 1L, "b" -> 2L))(mergeSum))
    assert(AtomicStore.foldOnce(spark, path, "b2", delta("a" -> 10L))(mergeSum))
    // retry storm: b1 re-delivered twice — must return false, change nothing
    assert(!AtomicStore.foldOnce(spark, path, "b1", delta("a" -> 1L, "b" -> 2L))(mergeSum))
    assert(!AtomicStore.foldOnce(spark, path, "b1", delta("a" -> 999L))(mergeSum))
    val state = AtomicStore.readState(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 11L, "b" -> 2L), s"got $state")
    // the raw table carries exactly the two ledger markers, nulls elsewhere
    val raw = spark.read.parquet(path)
    assert(raw.columns.contains(AtomicStore.LedgerCol))
    val markers = raw.filter(col(AtomicStore.LedgerCol).isNotNull)
    assert(markers.count() == 2L)
    assert(markers.filter(col("k").isNotNull || col("n").isNotNull).count() == 0L,
      "ledger markers must not carry state values")
  }

  test("state and ledger commit in ONE swap: the table is always internally consistent") {
    // fold twice, then re-read the store BETWEEN folds through readState —
    // the marker for a batch appears exactly when its counts do
    val path = store()
    AtomicStore.foldOnce(spark, path, "night_1", delta("x" -> 5L))(mergeSum)
    val afterOne = spark.read.parquet(path)
    assert(afterOne.filter(col(AtomicStore.LedgerCol) === "night_1").count() == 1L)
    assert(AtomicStore.readState(spark, path).as[(String, Long)].collect()
      .toSet == Set("x" -> 5L))
    AtomicStore.foldOnce(spark, path, "night_2", delta("x" -> 7L))(mergeSum)
    assert(AtomicStore.readState(spark, path).as[(String, Long)].collect()
      .toSet == Set("x" -> 12L))
  }

  test("a delta that already carries the ledger column is rejected loudly") {
    val path = store()
    val bad = delta("a" -> 1L).withColumn(AtomicStore.LedgerCol, lit("x"))
    val e = intercept[IllegalArgumentException] {
      AtomicStore.foldOnce(spark, path, "b1", bad)(mergeSum)
    }
    assert(e.getMessage.contains(AtomicStore.LedgerCol))
  }

  test("a pre-ledger legacy store is adopted as all-state with an empty ledger") {
    // round-14 advice: a store written before foldOnce existed has no
    // __batch_id column — the first fold must adopt it, not throw
    val path = store()
    delta("a" -> 5L, "b" -> 7L).write.parquet(path)
    assert(AtomicStore.readState(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 5L, "b" -> 7L))
    assert(AtomicStore.foldOnce(spark, path, "b1", delta("a" -> 1L))(mergeSum))
    val state = AtomicStore.readState(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 6L, "b" -> 7L), s"got $state")
    assert(spark.read.parquet(path)
      .filter(col(AtomicStore.LedgerCol) === "b1").count() == 1L)
  }

  test("a merge that changes the column set is rejected before any write") {
    val path = store()
    assert(AtomicStore.foldOnce(spark, path, "b1", delta("a" -> 1L))(mergeSum))
    val e = intercept[IllegalArgumentException] {
      AtomicStore.foldOnce(spark, path, "b2", delta("a" -> 2L)) { (st, d) =>
        mergeSum(st, d).withColumnRenamed("n", "total")
      }
    }
    assert(e.getMessage.contains("column set"))
    // nothing committed: b2 still folds with a correct merge
    assert(AtomicStore.foldOnce(spark, path, "b2", delta("a" -> 2L))(mergeSum))
    assert(AtomicStore.readState(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L))
  }

  test("ledger compaction: watermark keeps old AND recent re-deliveries no-ops") {
    // round-14 verdict #5: a 10-minute stream writes 52k markers/year —
    // compaction collapses old numbered markers into a watermark row
    val path = store()
    (0 to 3).foreach { i =>
      assert(AtomicStore.foldOnce(spark, path, s"mb_$i",
        delta("a" -> (1L << i)))(mergeSum))
    }
    assert(AtomicStore.compactLedger(spark, path, retainLast = 1) == 3)
    // ledger now: 1 watermark row + 1 retained marker
    val markers = spark.read.parquet(path)
      .filter(col(AtomicStore.LedgerCol).isNotNull)
      .select(AtomicStore.LedgerCol).collect().map(_.getString(0)).toSet
    assert(markers == Set("wm#mb#2", "mb_3"), s"got $markers")
    // pre-watermark and retained ids both stay no-ops
    assert(!AtomicStore.foldOnce(spark, path, "mb_0", delta("a" -> 99L))(mergeSum))
    assert(!AtomicStore.foldOnce(spark, path, "mb_2", delta("a" -> 99L))(mergeSum))
    assert(!AtomicStore.foldOnce(spark, path, "mb_3", delta("a" -> 99L))(mergeSum))
    // a new id folds; numeric comparison is by value, not string order
    // (mb_10 > watermark 2 even though "mb_10" < "mb_2" lexically)
    assert(AtomicStore.foldOnce(spark, path, "mb_10", delta("a" -> 16L))(mergeSum))
    val state = AtomicStore.readState(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 31L), s"got $state")
    // compacting again folds the retained tail into the watermark
    assert(AtomicStore.compactLedger(spark, path, retainLast = 0) == 2)
    assert(!AtomicStore.foldOnce(spark, path, "mb_10", delta("a" -> 99L))(mergeSum))
    // non-conforming ids are kept verbatim, never subsumed
    assert(AtomicStore.foldOnce(spark, path, "adhoc", delta("a" -> 1L))(mergeSum))
    assert(AtomicStore.compactLedger(spark, path) == 0)
    assert(!AtomicStore.foldOnce(spark, path, "adhoc", delta("a" -> 1L))(mergeSum))
  }

  test("batch ids may not use the reserved watermark tag") {
    val e = intercept[IllegalArgumentException] {
      AtomicStore.foldOnce(spark, store(), "wm#mb#5", delta("a" -> 1L))(mergeSum)
    }
    assert(e.getMessage.contains("wm#"))
  }
}
