package graft

import graft.operators.Hints

/** SCALE.md's graceful-degradation claim, proven instead of asserted
  * (round-7 verdict #5): every dimension-sized join side in the library
  * is broadcast-hinted, and the claim is that a deployment whose "small"
  * side outgrows the broadcast budget can flip `spark.graft.broadcastHints`
  * off and get the SAME results under Catalyst's shuffle-join planning.
  *
  * Each covered query runs twice on sf0.001 — default planning vs
  * (hints off + autoBroadcastJoinThreshold=-1, so the optimizer cannot
  * re-derive a broadcast from statistics either) — and the collected
  * outputs must match row-for-row. The disabled run also asserts no
  * BroadcastHashJoin survived in the executed plan, so the test can
  * never silently pass by planning the same join twice.
  *
  * Coverage spans the hinted families: J1 dim rollup (Joins.dimLeft),
  * F11 alias normalization (broadcast alias map), J4 two-key fallback
  * enrichment, J6 phased fuzzy title match, and the IVF centroid-assign
  * path (in-row broadcast-centroid argmax → cell join).
  */
class BroadcastFallbackSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val covered = Seq(
    "q_j1_dim_rollup",      // J1: broadcast dim join
    "q_f11_alias_normalize", // F11: broadcast alias map
    "q_j4_enrich_fallback", // J4: two broadcast lookup joins
    "q_j6_fuzzy_title",     // J6: broadcast containment candidates
    "q_sim_ivf_topk")       // IVF: centroid crossJoin + cell equi-join

  private def run(name: String): Seq[org.apache.spark.sql.Row] =
    try SparkEntry.queries(name)(spark, dir).collect().toSeq
    finally graft.operators.OpCache.clear()

  for (name <- covered) test(s"$name: identical output under forced shuffle-join planning") {
    val expected = run(name)
    assert(expected.nonEmpty, s"$name returned no rows — nothing compared")
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(Hints.confKey, "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"$name still planned a BroadcastHashJoin with hints off and threshold=-1")
      val got = df.collect().toSeq
      assert(got == expected,
        s"$name diverged under shuffle-join planning: " +
          s"${got.size} vs ${expected.size} rows; first diff: " +
          got.zip(expected).collectFirst { case (g, e) if g != e => s"$g vs $e" }
            .getOrElse("row count"))
    } finally {
      spark.conf.set(Hints.confKey, "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      graft.operators.OpCache.clear()
    }
  }
}
