package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** U1 semantics (ref: sqlite_connector.py:76-114 ON CONFLICT DO UPDATE;
  * supabase upserts incl. multi-column conflict keys) — fresh beats base,
  * re-runs idempotent, highest version wins within a source.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("fresh row replaces base row on single conflict key") {
    val base = Seq(("e1", 1L, "old"), ("e2", 1L, "keep")).toDF("event_id", "v", "payload")
    val fresh = Seq(("e1", 2L, "new")).toDF("event_id", "v", "payload")
    val out = Upsert.upsert(base, fresh, Seq("event_id"), col("v"))
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("e1", "new"), ("e2", "keep")))
  }

  test("fresh wins even with lower version (ON CONFLICT DO UPDATE semantics)") {
    val base = Seq(("e1", 9L, "old")).toDF("event_id", "v", "payload")
    val fresh = Seq(("e1", 1L, "new")).toDF("event_id", "v", "payload")
    val out = Upsert.upsert(base, fresh, Seq("event_id"), col("v")).collect()
    assert(out.head.getString(2) == "new")
  }

  test("multi-column conflict key (event_id, theater_name, scraped_at)") {
    val base = Seq(
      ("e1", "CGV강남", 100L, "보유"),
      ("e1", "CGV강남", 200L, "소진중")).toDF("event_id", "theater_name", "scraped_at", "status")
    val fresh = Seq(
      ("e1", "CGV강남", 200L, "소진")).toDF("event_id", "theater_name", "scraped_at", "status")
    val out = Upsert.upsert(base, fresh, Seq("event_id", "theater_name", "scraped_at"), col("scraped_at"))
      .orderBy("scraped_at").collect()
    assert(out.length == 2)
    assert(out.map(_.getString(3)).toSeq == Seq("보유", "소진"))
  }

  test("applyCdc: tombstones delete, D-then-U resurrects, re-apply is a no-op") {
    val store = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "payload")
    val feed = Seq(
      (1L, "a",  "D", 1L),              // plain delete
      (2L, "b2", "U", 1L), (2L, "b", "D", 2L), // U then D → net delete
      (3L, "c",  "D", 1L), (3L, "c2", "U", 2L), // D then U → resurrected
      (5L, "e",  "I", 1L))              // brand-new key
      .toDF("k", "payload", "op", "seq")
    val once = Upsert.applyCdc(store, feed, Seq("k"), "op", "seq")
    val got = once.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // 4 untouched, 3 resurrected with the new payload, 5 inserted
    assert(got == Seq((3L, "c2"), (4L, "d"), (5L, "e")))
    // re-applying the same feed to the merged store changes nothing:
    // every feed row resolves identically by sequence
    val twice = Upsert.applyCdc(once, feed, Seq("k"), "op", "seq")
    assert(twice.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq == got)
  }

  test("scd2FromCdc: versions interval-chain; tombstones close without opening") {
    val feed = Seq(
      (1L, "v1", "I", 1L), (1L, "v2", "U", 2L),             // two open-then-closed versions
      (2L, "w1", "U", 1L), (2L, "w1", "D", 2L),             // closed by a tombstone
      (3L, "x1", "D", 1L), (3L, "x2", "U", 2L))             // D first, then a fresh version
      .toDF("k", "payload", "op", "seq")
    val out = Upsert.scd2FromCdc(feed, Seq("k"), "op", "seq")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "v1", 1L, 2L, false), (1L, "v2", 2L, -1L, true),
      (2L, "w1", 1L, 2L, false),                  // closed at the D's seq, no current row
      (3L, "x2", 2L, -1L, true)))                 // the D emitted nothing
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val base = Seq(("e1", 1L, "a"), ("e2", 2L, "b")).toDF("event_id", "v", "payload")
    val batch = Seq(("e2", 3L, "b2"), ("e3", 1L, "c")).toDF("event_id", "v", "payload")
    val once = Upsert.upsert(base, batch, Seq("event_id"), col("v"))
    val twice = Upsert.upsert(once, batch, Seq("event_id"), col("v"))
    assert(once.orderBy("event_id").collect().toSeq ==
           twice.orderBy("event_id").collect().toSeq)
    assert(twice.count() == 3)
  }

  test("applyCdc malformed-feed tie-break: duplicate (key, seq) resolves " +
      "D > U > I deterministically, any partitioning (round-8 advice)") {
    import spark.implicits._
    val store = Seq(("k1", "old"), ("k2", "old"), ("k3", "old"))
      .toDF("id", "payload")
    // three keys, each with TWO ops at the same sequence:
    //   k1: U + D at seq 5  → D wins → key deleted
    //   k2: I + U at seq 5  → U wins → U's payload survives
    //   k3: D at 5 beaten by U at 6 (sanity: seq still dominates op rank)
    val feed = Seq(
      ("k1", "U", 5L, "u1"), ("k1", "D", 5L, null),
      ("k2", "I", 5L, "i2"), ("k2", "U", 5L, "u2"),
      ("k3", "D", 5L, null), ("k3", "U", 6L, "u3"))
      .toDF("id", "op", "seq", "payload")
    def run(f: org.apache.spark.sql.DataFrame) =
      Upsert.applyCdc(store, f, Seq("id"), "op", "seq")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val out = run(feed)
    assert(out == Map("k2" -> "u2", "k3" -> "u3"), out.toString)
    assert(run(feed.repartition(5)) == out)
    assert(run(feed.orderBy(col("op").asc)) == out)
  }
}
