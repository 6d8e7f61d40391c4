package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}

/** SQL surface for Spark's built-in Bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the exact
  * machinery Catalyst's `InjectRuntimeFilter` uses internally for
  * runtime shuffle pruning, exposed as callable functions so operators
  * can build a membership PREFILTER inside the plan:
  *
  * {{{
  *   SELECT ... FROM corpus
  *   WHERE might_contain((SELECT bloom_filter_agg(h) FROM probe), h)
  * }}}
  *
  * The scalar subquery executes once, its fixed-size bitmap result is
  * shipped to every task (BloomFilterMightContain explicitly admits a
  * scalar-subquery bloom argument), and the corpus side is filtered in
  * whole-stage codegen BEFORE any shuffle. That is the 100 TB
  * decontamination shape: the probe SET can be arbitrarily large — the
  * only thing that must fit everywhere is the sketch (bits are capped by
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`), and false
  * positives only mean a few extra rows survive to the exact confirm
  * join, never a wrong answer.
  *
  * Not registered by the operators' usual `createOrReplaceTempFunction`
  * dance alone — also injected application-wide by
  * [[graft.GraftExtensions]] so the §2.11 SQL surface can use it.
  */
object BloomSketch {

  val AggFnName   = "bloom_filter_agg"
  val ProbeFnName = "might_contain"

  /** `bloom_filter_agg(value[, est_items[, num_bits]])` — value must be
    * a LONG (hash upstream with xxhash64/shingle_hash64); est/bits are
    * foldable long literals, defaulted from the runtime-filter confs.
    */
  def aggFromExprs(exprs: Seq[Expression]): Expression = {
    val agg = exprs match {
      case Seq(v)           => new BloomFilterAggregate(v)
      case Seq(v, est)      => new BloomFilterAggregate(v, est)
      case Seq(v, est, nb)  => new BloomFilterAggregate(v, est, nb)
      case other => throw new IllegalArgumentException(
        s"$AggFnName expects 1-3 arguments, got ${other.size}")
    }
    agg.toAggregateExpression()
  }

  /** `might_contain(bloom, value)` — bloom is a binary sketch from
    * [[AggFnName]] (constant or scalar subquery); value a LONG.
    */
  def probeFromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"$ProbeFnName expects 2 arguments, got ${exprs.size}")
    BloomFilterMightContain(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggFnName, aggFromExprs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ProbeFnName, probeFromExprs, "scala_udf")
  }
}
