package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** J4 — composite-alternate-key enrichment (movie_events_scraper.py:307-367):
  * primary match on key₁, misses retried on a different key₂, enriched
  * columns coalesced, right sides deduped for 1:1.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("fallback lookup uses a different composite key; primary hit wins") {
    val fact = Seq(
      ("g1", "F1 더 무비", "2025.06.30", "2025.07.28"),
      ("g2", "판타스틱4", "2025.07.01", "2025.08.01"),
      ("g3", "미매칭", "2099.01.01", "2099.02.01")
    ).toDF("goods_id", "movie_title", "start_date", "end_date")

    // primary keyed by movie_title; fallback keyed by (start_date, end_date)
    val primary = Seq(("F1 더 무비", "https://primary/f1"))
      .toDF("movie_title", "event_url")
    val fallback = Seq(
      ("2025.07.01", "2025.08.01", "https://fallback/fant4"),
      ("2025.06.30", "2025.07.28", "https://fallback/should-lose"))
      .toDF("start_date", "end_date", "event_url")

    val out = Joins.enrichWithFallbackKeys(fact, primary, fallback,
        Seq("movie_title"), Seq("start_date", "end_date"), Seq("event_url"))
      .orderBy("goods_id")
      .select("goods_id", "event_url").as[(String, String)].collect()

    assert(out(0) == ("g1", "https://primary/f1"))      // primary beats fallback
    assert(out(1) == ("g2", "https://fallback/fant4"))  // miss → alternate key
    assert(out(2)._2 == null)                           // no match anywhere
  }

  test("1:1 semantics: duplicate lookup keys are deduped before the join") {
    val fact = Seq(("a", 1)).toDF("k", "v")
    val lookup = Seq(("a", "x"), ("a", "y")).toDF("k", "e")
    val out = Joins.enrichWithFallback(fact, lookup, lookup, Seq("k"), Seq("e"))
    assert(out.count() == 1) // no fan-out from the duplicate right side
  }
}
