package graft

import graft.operators.{Analytics, Joins}
import org.apache.spark.sql.functions._

/** J7 as-of join, J8 range join, A14 KMV sketch — semantics on small
  * hand-checked fixtures.
  */
class AsOfRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches the latest event at-or-before each probe, per key") {
    val events = Seq(
      (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 30L, 102L, 3.0),
      (2L, 15L, 200L, 9.0)
    ).toDF("k", "t", "eid", "v")
    val probes = Seq((1L, 5L), (1L, 20L), (1L, 25L), (2L, 100L), (3L, 50L))
      .toDF("k", "pt")
    val out = Joins.asOf(probes, events, Seq("k"), "pt", "t",
        carryCols = Seq("eid", "v"), tieBreak = Seq("eid"))
      .orderBy("k", "pt").collect()
    // probe before any event → nulls
    assert(out(0).isNullAt(2))
    // at-or-before includes the equal-time event (t=20)
    assert(out(1).getLong(2) == 101L)
    assert(out(2).getLong(2) == 101L)
    assert(out(3).getLong(2) == 200L)
    // key with no events at all → nulls
    assert(out(4).isNullAt(2))
  }

  test("asOf ties at equal event time break by the tieBreak column (last wins)") {
    val events = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 7L, 2.0), (1L, 10L, 6L, 3.0))
      .toDF("k", "t", "eid", "v")
    val probes = Seq((1L, 10L)).toDF("k", "pt")
    val out = Joins.asOf(probes, events, Seq("k"), "pt", "t",
        Seq("eid", "v"), Seq("eid")).collect()
    assert(out.head.getLong(2) == 7L) // max eid wins deterministically
  }

  test("asOfForward attaches the first event at-or-after each probe; ties pick the EARLIEST") {
    val events = Seq(
      (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 30L, 102L, 3.0),
      (2L, 15L, 200L, 9.0)
    ).toDF("k", "t", "eid", "v")
    val probes = Seq((1L, 5L), (1L, 20L), (1L, 25L), (1L, 35L), (3L, 50L))
      .toDF("k", "pt")
    val out = Joins.asOfForward(probes, events, Seq("k"), "pt", "t",
        carryCols = Seq("eid", "v"), tieBreak = Seq("eid"))
      .orderBy("k", "pt").collect()
    assert(out(0).getLong(2) == 100L)  // next after 5 is t=10
    assert(out(1).getLong(2) == 101L)  // at-or-after includes t=20
    assert(out(2).getLong(2) == 102L)  // next after 25 is t=30
    assert(out(3).isNullAt(2))         // probe after the last event → nulls
    assert(out(4).isNullAt(2))         // key with no events → nulls
    // equal-time ties: the MINIMUM tieBreak wins (the backward dual's mirror)
    val tied = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 7L, 2.0), (1L, 10L, 6L, 3.0))
      .toDF("k", "t", "eid", "v")
    val one = Joins.asOfForward(Seq((1L, 10L)).toDF("k", "pt"), tied,
      Seq("k"), "pt", "t", Seq("eid", "v"), Seq("eid")).collect()
    assert(one.head.getLong(2) == 5L)
  }

  test("approx_percentile stays within its accuracy envelope of the exact percentile") {
    // the documented 100 TB swap for exact percentiles (SCALE.md): pin
    // the error bound so the swap is evidenced, not asserted. accuracy
    // 10000 → rank error <= n/10000; on n=10000 rows of 1..10000 the
    // p50/p90 estimates must land within ±2 of exact (loose 2x slack).
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val r = df.agg(
      expr("percentile(v, 0.5)").as("exact50"),
      expr("approx_percentile(v, 0.5, 10000)").as("ap50"),
      expr("percentile(v, 0.9)").as("exact90"),
      expr("approx_percentile(v, 0.9, 10000)").as("ap90")).head()
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) <= 2.0,
      s"p50 ${r.getDouble(1)} vs ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(3) - r.getDouble(2)) <= 2.0,
      s"p90 ${r.getDouble(3)} vs ${r.getDouble(2)}")
  }

  test("rangeJoin matches point-in-interval exactly, no duplicates across buckets") {
    val intervals = Seq((1L, 0L, 13L), (2L, 5L, 6L), (3L, 20L, 21L))
      .toDF("ivid", "lo", "hi")
    val points = (0L to 25L).map(p => (p, p)).toDF("pid", "p")
    val out = Joins.rangeJoin(points, intervals, "p", "lo", "hi", bucketWidth = 7)
      .select("ivid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = for {
      (ivid, lo, hi) <- Seq((1L, 0L, 13L), (2L, 5L, 6L), (3L, 20L, 21L))
      p <- lo to hi
    } yield (ivid, p)
    assert(out.sorted.toSeq == expected.sorted)
  }

  test("kmv estimate lands within 25% of the true distinct count") {
    val df = (1 to 20000).map(i => i % 3000).toDF("key")
    val r = Analytics.kmvDistinctEstimate(df, "key", k = 64).collect().head
    val est = r.getDouble(1)
    val truth = r.getLong(2)
    assert(truth == 3000)
    assert(math.abs(est - truth) / truth < 0.25, s"est=$est truth=$truth")
  }
}
