package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Mergeable-state algebra of the incremental aggregate store: merged
  * batches must equal a one-shot aggregate, in ANY merge order, with
  * the KMV distinct sketch exactly mergeable and exact below k.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")
  private val K = 8

  private def rows = Seq(
    ("a", 1L, 10.0), ("a", 2L, -5.0), ("a", 3L, 7.5), ("a", 1L, 2.0),
    ("b", 4L, 1.0), ("b", 4L, 1.0), ("b", 5L, 3.0),
    ("c", 6L, 100.0) // key present in only one batch below
  )

  private def df(rs: Seq[(String, Long, Double)]) =
    rs.toDF("g", "uid", "value")

  test("merged batch states equal the one-shot aggregate, in any merge order") {
    val all = df(rows)
    val oneShot = IncrementalAgg.finalize(
        IncrementalAgg.aggregateBatch(all, keys, "value", "uid", K), keys, K)
      .orderBy("g").collect().toSeq
    val parts = Seq(
      df(rows.take(3)), df(rows.slice(3, 6)), df(rows.drop(6)))
      .map(IncrementalAgg.aggregateBatch(_, keys, "value", "uid", K))
    for (order <- Seq(parts, parts.reverse, Seq(parts(1), parts(2), parts(0)))) {
      val store = order.reduce(IncrementalAgg.merge(_, _, keys, K))
      val got = IncrementalAgg.finalize(store, keys, K)
        .orderBy("g").collect().toSeq
      assert(got == oneShot, s"merge-order divergence: $got vs $oneShot")
    }
  }

  test("distinct estimate is EXACT while a group has seen fewer than k values") {
    val state = IncrementalAgg.aggregateBatch(df(rows), keys, "value", "uid", K)
    val fin = IncrementalAgg.finalize(state, keys, K).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    // K=8 > every group's distinct count -> exact: a:{1,2,3}, b:{4,5}, c:{6}
    assert(fin == Map("a" -> 3.0, "b" -> 2.0, "c" -> 1.0), s"got $fin")
  }

  test("n/sum/min/max state is correct after merging disjoint-key batches") {
    val s1 = IncrementalAgg.aggregateBatch(df(rows.take(4)), keys, "value", "uid", K)
    val s2 = IncrementalAgg.aggregateBatch(df(rows.drop(4)), keys, "value", "uid", K)
    val fin = IncrementalAgg.finalize(
        IncrementalAgg.merge(s1, s2, keys, K), keys, K)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(fin("a") == (4L, 14.5, -5.0, 10.0))
    assert(fin("b") == (3L, 5.0, 1.0, 3.0))
    assert(fin("c") == (1L, 100.0, 100.0, 100.0))
  }

  test("sketch truncation: merged kmv holds the k smallest of the union") {
    // 20 distinct uids in one group, k=8: merged sketch must equal the
    // 8 smallest md5-fractions of the full set regardless of batching
    val wide = (1L to 20L).map(u => ("a", u, 1.0))
    val oneShot = IncrementalAgg.aggregateBatch(df(wide), keys, "value", "uid", K)
      .select(col("kmv")).head().getSeq[Double](0)
    assert(oneShot.size == K)
    val merged = Seq(df(wide.take(7)), df(wide.slice(7, 14)), df(wide.drop(14)))
      .map(IncrementalAgg.aggregateBatch(_, keys, "value", "uid", K))
      .reduce(IncrementalAgg.merge(_, _, keys, K))
      .select(col("kmv")).head().getSeq[Double](0)
    assert(merged == oneShot, "merged sketch is not the k smallest of the union")
  }
}
