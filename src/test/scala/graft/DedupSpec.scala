package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val near2 = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
  private val other = "completely different content with no overlap at all in any shingle window here"

  test("exactCanonical groups identical texts and keeps min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "unique")).toDF("doc_id", "text")
    val out = Dedup.exactCanonical(df, "doc_id", "text")
      .orderBy("kept_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("wordShingles produces distinct k-grams; short docs drop out") {
    val df = Seq((1L, "a b c d e f"), (2L, "too short")).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(df, "doc_id", "text", 5).collect()
    assert(sh.map(_.getLong(0)).forall(_ == 1L))
    assert(sh.map(_.getString(1)).sorted.toSeq == Seq("a b c d e", "b c d e f"))
  }

  test("jaccardPairs finds near-duplicates above threshold only") {
    val df = Seq((1L, near1), (2L, near2), (3L, other)).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(df, "doc_id", "text", 5)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.5).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == (1L, 2L))
    assert(pairs.head.getDouble(3) > 0.5 && pairs.head.getDouble(3) < 1.0)
  }

  test("minhashLshPairs recovers the same near-dup pair via banding") {
    val df = Seq((1L, near1), (2L, near2), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text",
      k = 5, numHashes = 16, numBands = 4, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("identical docs always share all LSH bands") {
    val df = Seq((1L, near1), (2L, near1)).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(df, "doc_id", "text", 5)
    val bk = Dedup.lshBandKeys(Dedup.minhashSignatures(sh, "doc_id", 16), "doc_id", 16, 4)
    val cands = Dedup.lshCandidates(bk, "doc_id").collect()
    assert(cands.length == 1)
  }
}
