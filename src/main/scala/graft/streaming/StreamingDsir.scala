package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Hints, TextAnalysis}

/** Streaming DSIR scoring — the online face of the importance model:
  * documents arrive on a stream and are scored against a STORED
  * [[graft.operators.TextAnalysis.dsirModel]] built batch-side (and
  * kept fresh by [[graft.operators.TextAnalysis.dsirMergeModels]] as
  * deltas land). The model join is stream-STATIC and therefore
  * stateless — each micro-batch plans a fresh broadcast of the
  * O(buckets) LLR table; no watermark, no state store on the join.
  *
  * The score is formulated as a SINGLE streaming aggregation:
  *   Σ_b tf_b · lnr_b  =  Σ_{feature instances} lnr_{bucket(instance)},
  * so the per-(doc,bucket) tf pre-aggregation the batch scorer runs is
  * algebraically folded into the per-doc sum — chained aggregations are
  * unsupported in streaming, and this identity is what makes the
  * one-agg plan possible. The identity holds at infinite precision but
  * NOT under per-term DECIMAL(38,6) quantization (the batch scorer
  * rounds tf·lnr once per bucket; this dual rounds lnr per instance),
  * so the streaming query carries its own instance-level oracle rather
  * than reusing the batch one — same model CTEs, instance-level final
  * aggregate.
  *
  * State posture: every feature of a document explodes from ONE input
  * row, so each doc's aggregate is already complete within its arrival
  * micro-batch — cross-batch state adds nothing. The bounded drain uses
  * complete mode for the memory-sink contract; a production deployment
  * scores per-batch under foreachBatch (zero retained state) or update
  * mode with an event-time watermark to expire emitted docs.
  */
object StreamingDsir {

  /** (idCol, n_feats, dsir_log_weight) per streamed document. */
  def scored(docs: DataFrame, model: DataFrame,
             idCol: String, textCol: String,
             buckets: Int = 8192): DataFrame =
    TextAnalysis.dsirFeatBuckets(docs, col(idCol), textCol, buckets)
      .join(Hints.bcast(TextAnalysis.dsirLnr(model, buckets)), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(graft.Tables.dec(col("__lnr"))).cast("double"), 6)
          .as("dsir_log_weight"))
      .select(col("__id").as(idCol), col("n_feats"), col("dsir_log_weight"))
}
