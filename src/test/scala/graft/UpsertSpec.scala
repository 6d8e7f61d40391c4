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

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val base = Seq(("e1", 1L, "a"), ("e2", 2L, "b")).toDF("event_id", "v", "payload")
    val batch = Seq(("e2", 3L, "b2"), ("e3", 1L, "c")).toDF("event_id", "v", "payload")
    val once = Upsert.upsert(base, batch, Seq("event_id"), col("v"))
    val twice = Upsert.upsert(once, batch, Seq("event_id"), col("v"))
    assert(once.orderBy("event_id").collect().toSeq ==
           twice.orderBy("event_id").collect().toSeq)
    assert(twice.count() == 3)
  }
}
