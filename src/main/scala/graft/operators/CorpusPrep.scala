package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The statistical successor to [[prepare]]'s hand-rule gate: score →
    * filter → importance-select → split, composed from the round-11
    * quality operators. Every doc is scored by the interpolated
    * bigram-LM cross-entropy (fluency), the Naive-Bayes log-odds
    * against `target` (domain membership), and the DSIR hashed-n-gram
    * log-weight (importance for resampling toward the target); docs
    * keep iff the NB prediction is positive AND the bigram CE is at
    * most `maxBigramCe`; `n` survivors are drawn weight-proportionally
    * via [[Analytics.gumbelTopK]] (log-space — DSIR weights span
    * hundreds of nats); the draw is split train/val/test by the md5
    * fraction rule. All thresholds compare the operators' 6-dp-ROUNDED
    * outputs, so the kept set is engine-exact by construction.
    *
    * 100 TB shape: three scorer plans share the corpus scan shape
    * (each is one corpus-sized keyed aggregate + a model join — see the
    * scorers' scaladoc for their broadcast/adaptive postures), joined
    * back on the id; selection is TakeOrderedAndProject (per-partition
    * heaps) by default, or — `thresholdSelect = true`, the posture for
    * corpus-scale draws — [[Analytics.gumbelSelect]]'s distributed
    * threshold filter, which selects the IDENTICAL set without ever
    * merging the n winners on the driver; the split adds no exchange.
    * The scorers deliberately stay independent plans rather than
    * sharing a token explode: the shared explode saves one scan but
    * couples the LM shuffle layouts, and the scan is the cheap term at
    * every measured scale.
    */
  def trainingMix(df: DataFrame, idCol: String, textCol: String,
                  target: Column, maxBigramCe: Double, n: Int, salt: String,
                  valRate: Double, testRate: Double,
                  buckets: Int = 8192,
                  thresholdSelect: Boolean = false): DataFrame = {
    val ce = TextAnalysis.bigramCrossEntropy(df, idCol, textCol)
    val nb = TextAnalysis.nbLogOdds(df, idCol, textCol, target)
      .withColumnRenamed("n_tokens", "n_tokens_nb")
    val dsir = TextAnalysis.dsirLogWeights(df, df.where(target), idCol,
      textCol, buckets)
    val kept = ce.join(nb, idCol).join(dsir, idCol)
      .where(col("pred") && col("bigram_ce") <= lit(maxBigramCe))
      .select(col(idCol), col("bigram_ce"), col("nb_log_odds"),
        col("dsir_log_weight"))
    val drawn =
      if (thresholdSelect)
        Analytics.gumbelSelect(kept, idCol, "dsir_log_weight", n, salt)
      else Analytics.gumbelTopK(kept, idCol, "dsir_log_weight", n, salt)
    Analytics.withSplit(drawn, idCol, valRate, testRate)
  }
}
