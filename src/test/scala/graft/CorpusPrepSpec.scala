package graft

import graft.operators.CorpusPrep

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("prepare gates, exact-dedups, then mixes over survivor counts") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),  // kept
      (2L, "the cat sat on the mat", "en"),  // exact dup of 1 → dropped
      (3L, "el la de que y algo mas aqui", "es"), // detected es → lang gate
      (4L, "a b", "en"),                     // too short
      (5L, "the dog ran to the old barn", "en") // kept
    ).toDF("doc_id", "text", "lang")
    val out = CorpusPrep.prepare(docs, "doc_id", "text", "lang",
        minTokens = 3, maxRepetition = 0.9, minQuality = 0.0,
        allowedLangs = Seq("en"), alpha = 0.5, total = 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 5L),
      s"got ${out.mkString(",")}")
    // n_tokens carried through from the gate's signal columns
    assert(out.forall(_.getAs[Int]("n_tokens") >= 3))
    graft.operators.OpCache.clear()
  }
}
