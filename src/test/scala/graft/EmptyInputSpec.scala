package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empty-input sweep over the operator library — the robustness corner a
  * 100 TB pipeline hits constantly (a partition-pruned read, a filter
  * that matched nothing, day one of an incremental store): every
  * operator must return an EMPTY result of the right schema or fail
  * LOUDLY with a contract message — never NPE, never a null-poisoned
  * row, never a silent wrong answer.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def docs0: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emb0: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup family: empty corpus → empty results, correct schemas") {
    assert(Dedup.exactCanonical(docs0, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshPairs(docs0, "doc_id", "text",
      k = 5, numHashes = 16, numBands = 4, threshold = 0.5).count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b").count() == 0)
    val corpus = Dedup.dedupCorpus(docs0, "doc_id", "text",
      k = 5, numHashes = 16, numBands = 4, threshold = 0.5)
    assert(corpus.count() == 0)
    graft.operators.OpCache.clear()
  }

  test("text family: empty corpus → empty results") {
    assert(TextAnalysis.heavyHitters(docs0, "text", k = 4).count() == 0)
    assert(TextAnalysis.heavyHittersByGroup(
      docs0.withColumn("src", lit("s")), "src", "text", k = 4).count() == 0)
    assert(TextAnalysis.withTokenStats(docs0, "text").count() == 0)
    graft.operators.OpCache.clear()
  }

  test("drift: empty CURRENT side reports every reference key vanished; " +
      "empty reference reports every current key newborn") {
    val ref = Seq("en", "en", "de").toDF("lang")
    val empty = Seq.empty[String].toDF("lang")
    val out = Analytics.distributionDrift(ref, empty, "lang")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("cur_cnt"), r.getAs[Double]("psi_term"))).toMap
    assert(out.keySet == Set("en", "de"))
    assert(out.values.forall { case (c, psi) => c == 0L && psi > 0.0 && psi.isFinite })
    val out2 = Analytics.distributionDrift(empty, ref, "lang")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("ref_cnt")).toMap
    assert(out2 == Map("en" -> 0L, "de" -> 0L))
    // BOTH empty: nothing to report, and nothing blows up
    assert(Analytics.distributionDrift(empty, empty, "lang").count() == 0)
  }

  test("numericDrift refuses an empty reference LOUDLY (found by this " +
      "sweep: it used to emit a silent null-bin garbage row)") {
    import spark.implicits._
    val ref0 = Seq.empty[Double].toDF("v")
    val cur = Seq(1.0, 2.0).toDF("v")
    val e = intercept[Exception] {
      Analytics.numericDrift(ref0, cur, "v", nBins = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("reference snapshot is empty")), e.toString)
    // and a valid reference with an empty CURRENT still reports: every
    // current bin count 0 except nothing — all reference bins vanish-side
    val ref = (1 to 40).map(_.toDouble).toDF("v")
    val out = Analytics.numericDrift(ref, Seq.empty[Double].toDF("v"), "v", nBins = 4)
      .collect().map(r => r.getAs[Long]("cur_cnt"))
    assert(out.length == 4 && out.forall(_ == 0L))
  }

  test("numericDriftSketch refuses an empty reference LOUDLY (the sketch " +
      "variant's emptiness signature is an empty edge ARRAY, not a null)") {
    import spark.implicits._
    val ref0 = Seq.empty[Double].toDF("v")
    val cur = Seq(1.0, 2.0).toDF("v")
    val e = intercept[Exception] {
      Analytics.numericDriftSketch(ref0, cur, "v", nBins = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("reference snapshot is empty")), e.toString)
    // valid reference + empty current still reports zeros on every bin
    val ref = (1 to 40).map(_.toDouble).toDF("v")
    val out = Analytics.numericDriftSketch(
        ref, Seq.empty[Double].toDF("v"), "v", nBins = 4)
      .collect().map(r => r.getAs[Long]("cur_cnt"))
    assert(out.nonEmpty && out.forall(_ == 0L))
  }

  test("similarity family: empty corpus/queries → empty top-k") {
    assert(Similarity.bruteForceTopK(emb0, emb0,
      "vec_id", "embedding", k = 3).count() == 0)
    val one = Seq((1L, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    // empty QUERY side against a real corpus
    assert(Similarity.bruteForceTopK(emb0, one,
      "vec_id", "embedding", k = 3).count() == 0)
    graft.operators.OpCache.clear()
  }

  test("quality-filter family: empty corpus → empty; null/empty/1-token text " +
      "rows flow through without ANSI crashes") {
    val en = coalesce(col("lang") === "en", lit(false))
    val d0 = docs0.withColumn("lang", lit("en"))
    assert(TextAnalysis.bigramCrossEntropy(d0, "doc_id", "text").count() == 0)
    assert(TextAnalysis.nbLogOdds(d0, "doc_id", "text", en).count() == 0)
    assert(TextAnalysis.dsirLogWeights(d0, d0.where(en), "doc_id", "text", 64).count() == 0)
    graft.operators.OpCache.clear()
    // null text, empty text, single token, double spaces — the rows the
    // ANSI-mode slice/size/explode path must drop rather than throw on
    val messy = Seq((1L, Option("a b"), "en"), (2L, None: Option[String], "en"),
      (3L, Option(""), "fr"), (4L, Option("x"), "fr"), (5L, Option("a  b"), "en"))
      .toDF("doc_id", "text", "lang")
    val ce = TextAnalysis.bigramCrossEntropy(messy, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ce == Set(1L, 5L)) // only ≥2-token docs have a bigram stream
    val nb = TextAnalysis.nbLogOdds(messy, "doc_id", "text", en)
      .select("doc_id").as[Long].collect().toSet
    assert(nb == Set(1L, 4L, 5L)) // ≥1 token
    graft.operators.OpCache.clear()
    val ds = TextAnalysis.dsirLogWeights(messy, messy.where(en), "doc_id", "text", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(ds == Set(1L, 4L, 5L))
    graft.operators.OpCache.clear()
    // an EMPTY target corpus: the raw side's buckets survive the
    // full-outer model join with ct = 0 (smoothing keeps p_target > 0)
    val dsEmptyTarget = TextAnalysis.dsirLogWeights(
      messy, messy.where(lit(false)), "doc_id", "text", 64)
    assert(dsEmptyTarget.count() == 3)
    graft.operators.OpCache.clear()
    // gumbelTopK over an empty frame → empty
    assert(Analytics.gumbelTopK(
      Seq.empty[(Long, Double)].toDF("id", "lw"), "id", "lw", 3, "s").count() == 0)
  }

  test("null/empty TEXT rows flow through every text/dedup family without " +
      "throwing (two ANSI divide-by-zero crashes found and fixed here)") {
    val docs = Seq((1L, "the a is alpha beta and of to in gamma"), (2L, null),
      (3L, ""), (4L, "the a is alpha beta and of to in gamma"))
      .toDF("doc_id", "text")
    // withTokenStats / withQuality used to THROW on the empty string
    // (ANSI division by zero); tokenless docs now report null ratios
    val ts = TextAnalysis.withTokenStats(docs, "text")
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("ttr"))).toMap
    assert(ts(1L) == false && ts(2L) == true && ts(3L) == true)
    val qu = TextAnalysis.withQuality(docs, "text")
      .collect().map(r => r.getLong(0) ->
        r.isNullAt(r.fieldIndex("quality_score"))).toMap
    assert(qu(1L) == false && qu(3L) == true)
    // the rest of the family: no throw, sensible row counts (token-keyed
    // ops emit nothing for tokenless docs; doc-keyed ops keep all rows)
    assert(TextAnalysis.withLangId(docs, "text").count() == 4)
    assert(TextAnalysis.withRepetition(docs, "text").count() == 4)
    assert(TextAnalysis.withSimhash(docs, "doc_id", "text").count() == 2)
    assert(Dedup.noveltyScore(docs, "doc_id", "text", 2).count() == 2)
    // the null/empty docs must not break the near-dup path for real docs
    assert(Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 8, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)))
    graft.operators.OpCache.clear()
  }

  test("degenerate embeddings (NaN element, null vector, zero vector) are " +
      "excluded at the similarity boundary like wrong-dim vectors — " +
      "quantizeInt8 used to crash and NaN flowed into exact rankings") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, Array(Float.NaN, 0.1f, 0.1f, 0.1f)),
      (3L, Array(0f, 0f, 0f, 0f)),
      (4L, null.asInstanceOf[Array[Float]]),
      (5L, Array(0.5f, 0.5f, 0.5f, 0.49f))).toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 1),
        vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(1)).toSeq
    // NaN (2) and null (4) excluded; the zero vector (3) stays with its
    // documented cos_sim = 0 convention
    assert(bf == Seq(5L, 3L), bf.toString)
    // int8 quantization: one NaN used to throw CAST_OVERFLOW for the
    // whole job; now the corrupt vector is excluded, the rest quantize
    assert(Similarity.quantizeInt8(vecs, "vec_id", "embedding").count() == 3)
    graft.operators.OpCache.clear()
  }

  test("day-one streaming: a drain over an EMPTY source directory " +
      "terminates with an empty sink in both append and complete modes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    assert(graft.streaming.StreamDrain.drain(spark, dir, schema,
      "empty_drain_append", "append") { src =>
        src.filter(col("v") > 0) }.count() == 0)
    assert(graft.streaming.StreamDrain.drain(spark, dir, schema,
      "empty_drain_complete", "complete") { src =>
        src.groupBy("k").agg(count(lit(1)).as("n")) }.count() == 0)
  }

  test("upsert/CDC: empty feed is a no-op; empty store takes the whole feed") {
    val store = Seq(("k1", 1L, "a")).toDF("id", "v", "p")
    val feed0 = Seq.empty[(String, Long, String)].toDF("id", "v", "p")
    assert(Upsert.upsert(store, feed0, Seq("id"), col("v"))
      .collect().toSeq.map(_.getString(0)) == Seq("k1"))
    val store0 = Seq.empty[(String, Long, String)].toDF("id", "v", "p")
    assert(Upsert.upsert(store0, store, Seq("id"), col("v")).count() == 1)
    val cdc0 = Seq.empty[(String, String, Long, String)].toDF("id", "op", "seq", "p")
    assert(Upsert.applyCdc(store, cdc0, Seq("id"), "op", "seq").count() == 1)
  }
}
