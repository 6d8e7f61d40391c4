package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: quality gate → exact dedup →
  * temperature-balanced mix — the standard pretraining data flow,
  * composed from the individually-verified stages
  * ([[TextAnalysis.corpusGate]], [[Dedup.exactCanonical]],
  * [[Analytics.temperatureMix]]). The composed oracle query checks the
  * STAGE BOUNDARIES: what a unit test can't see is exactly where a
  * pipeline bug lives (a gate column leaking into the dedup key, mix
  * quotas computed over the pre-dedup counts, ...).
  *
  * 100 TB shape: the gate is map-side signal columns + a filter (no
  * shuffle); dedup is ONE hash aggregation on md5(text) followed by an
  * id equi-join; the mix's group count and per-group window run over
  * the already-gated-and-deduped survivor set, and its quota table is
  * group-cardinality-sized (broadcast). Net: two corpus-sized
  * exchanges (dedup agg, mix window) for the whole pipeline.
  */
object CorpusPrep {

  /** Returns the mixed training slice: (idCol, langCol, n_tokens),
    * quotas floor(total · n_lang^alpha / Σ) computed over SURVIVORS
    * (post-gate, post-dedup counts — the statistically right base).
    */
  def prepare(df: DataFrame, idCol: String, textCol: String, langCol: String,
              minTokens: Int, maxRepetition: Double, minQuality: Double,
              allowedLangs: Seq[String], alpha: Double, total: Long): DataFrame = {
    // persist the NARROW post-gate projection: the gate's signals (the
    // bigram-explode repetition ratio in particular) are the pipeline's
    // most expensive map-side work, and the frame feeds three consumers
    // (dedup agg, survivor join, mix count+window) — recomputing the
    // gate per consumer tripled the pipeline's cost in the bench. Text
    // is collapsed to its md5 BEFORE the persist ([[Dedup.exactCanonical]]'s
    // dedup key), so the cached rows are a few dozen bytes, not documents.
    val gated = OpCache.persist(TextAnalysis.corpusGate(df, idCol, textCol,
        minTokens, maxRepetition, minQuality, allowedLangs)
      .filter(col("kept"))
      .select(col(idCol), md5(col(textCol)).as("__h"), col(langCol),
        col("n_tokens")))
    val canonIds = gated.groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))
    val survivors = gated.join(canonIds, idCol).drop("__h")
    Analytics.temperatureMix(survivors, langCol, idCol, alpha, total)
      .select(col(idCol), col(langCol), col("n_tokens"))
  }
}
