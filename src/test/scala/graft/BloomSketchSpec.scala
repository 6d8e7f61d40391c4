package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The in-plan Bloom prefilter (graft.functions.BloomSketch +
  * Dedup.contaminationReportBloom): membership semantics, exactness of
  * the prefilter+confirm composition, and the plan shape that makes it
  * the big-probe-set scale path.
  */
class BloomSketchSpec extends SparkSpec {

  test("might_contain over bloom_filter_agg: no false negatives, sketch is fixed-size") {
    graft.functions.BloomSketch.register(spark)
    import spark.implicits._
    (1L to 1000L).toDF("v").createOrReplaceTempView("bloom_in")
    // every inserted value must probe true (Bloom filters cannot have
    // false negatives) — a single miss is a broken sketch
    val misses = spark.sql(
      """SELECT count(1) AS n FROM bloom_in
        |WHERE NOT might_contain((SELECT bloom_filter_agg(v) FROM bloom_in), v)
        |""".stripMargin).head().getLong(0)
    assert(misses == 0L, s"$misses inserted values probed false")
    // and values far outside the inserted set mostly probe false — with
    // default sizing (1M expected items) 5000 probes should see at most
    // a handful of false positives; a sketch that says yes to everything
    // is not filtering
    val fps = spark.sql(
      """SELECT count(1) AS n FROM (SELECT CAST(id + 1000000 AS BIGINT) AS v
        |                           FROM range(5000))
        |WHERE might_contain((SELECT bloom_filter_agg(v) FROM bloom_in), v)
        |""".stripMargin).head().getLong(0)
    assert(fps < 50, s"$fps/5000 false positives — sketch is not selective")
  }

  test("contaminationReportBloom ≡ contaminationReport (exact confirm join kills false positives)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val probe = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val exact = Dedup.contaminationReport(corpus, probe, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    val bloom = Dedup.contaminationReportBloom(corpus, probe, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture produced no contaminated docs — nothing compared")
    assert(bloom == exact,
      s"bloom variant diverged: ${bloom.size} vs ${exact.size} rows")
  }

  test("plan shape: prefilter survives under forced shuffle-join planning (big-probe posture)") {
    // the sf0.001 fixture is small enough that stats legitimately pick a
    // broadcast confirm join — the structural claim is about the
    // BIG-probe deployment, so force broadcast off and require (a) the
    // might_contain prefilter still sits in the plan, (b) the confirm
    // join planned as a non-broadcast join, (c) the answer is unchanged
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val probe = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val expected = Dedup.contaminationReport(corpus, probe, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Dedup.contaminationReportBloom(corpus, probe, "doc_id", "text", k = 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "prefilter was optimized away — the corpus side would shuffle unfiltered")
      assert(!plan.contains("BroadcastHashJoin"),
        "confirm join still requires broadcasting the probe relation")
      assert(df.orderBy("doc_id").collect().toSeq == expected,
        "output diverged under shuffle-join planning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }
}
