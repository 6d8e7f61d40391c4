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
