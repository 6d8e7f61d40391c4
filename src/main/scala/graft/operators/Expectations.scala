package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission-control step a
  * training-data pipeline runs before anything enters the corpus store
  * (the engine-side generalization of the reference's per-source coerce/
  * drop guards: `try_to_date` validity filters, fill-zero coercions,
  * status-set checks — kobisdata_pipeline/movie_events_pipeline apply
  * these inline per column; here they are one declarative rule set with
  * an auditable violations report).
  *
  * Three rule shapes, three plan shapes — each the minimal one:
  *
  *  - [[RowRule]]: a per-row predicate. ALL row rules evaluate in ONE
  *    scan — a single `agg` of conditional sums (map-side partial, no
  *    shuffle of data rows, one result row) — adding a rule adds a
  *    column to the aggregate, not a pass over the data.
  *  - [[Unique]]: key uniqueness via `count(*) − count(DISTINCT key)` —
  *    one hash aggregation.
  *  - [[RefIntegrity]]: foreign-key membership via a LEFT join against
  *    the DISTINCT dim keys and a null-count — the dim side is usually
  *    broadcast by stats; violations are rows whose key matched nothing
  *    (NULL keys violate: a null FK cannot prove membership).
  *
  * Violation semantics: a row violates a [[RowRule]] when the predicate
  * does NOT evaluate TRUE — so a NULL predicate result (e.g. a range
  * check over a NULL column) counts as a violation rather than silently
  * passing. Rules that want to admit NULLs say so (`isNull || pred`).
  *
  * 100 TB: `report` is Σ(one scan + one agg per set-level rule) with no
  * data-sized shuffle anywhere; `quarantine` is a pure map-side
  * filter+project emitting offending rows with rule attribution — the
  * same drop-attribution shape as `TextAnalysis.corpusGate`.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Violation = predicate not TRUE for the row. */
  final case class RowRule(name: String, pred: Column) extends Rule

  /** Violation count = rows beyond the first per distinct key. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule

  /** Violation = row whose `colName` matches no `dimCol` key. */
  final case class RefIntegrity(name: String, colName: String,
                                dim: DataFrame, dimCol: String) extends Rule

  // common row-rule constructors
  def notNull(c: String): RowRule = RowRule(s"not_null_$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"in_range_$c", col(c) >= lo && col(c) <= hi)
  def inSet(c: String, values: Seq[String]): RowRule =
    RowRule(s"in_set_$c", col(c).isin(values: _*))
  def matches(c: String, regex: String): RowRule =
    RowRule(s"matches_$c", col(c).rlike(regex))

  private def violated(r: RowRule): Column = !coalesce(r.pred, lit(false))

  /** One (rule, n_checked, n_violations) row per rule, every rule
    * evaluated over the full input.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectations: duplicate rule names would make the report ambiguous")
    val rowRules = rules.collect { case r: RowRule => r }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      // one scan for ALL row rules: wide one-row aggregate, then unpivot
      val aggs = count(lit(1)).as("__n") +:
        rowRules.map(r => sum(when(violated(r), 1L).otherwise(0L)).as(r.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val stacked = rowRules.map(r =>
        s"'${r.name}', `${r.name}`").mkString(", ")
      parts += wide.select(
        expr(s"stack(${rowRules.size}, $stacked) AS (rule, n_violations)"),
        col("__n").as("n_checked"))
    }
    rules.foreach {
      case _: RowRule => ()
      case Unique(name, cols) =>
        parts += df.agg(
          count(lit(1)).as("n_checked"),
          (count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
            .as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
      case RefIntegrity(name, c, dim, dimCol) =>
        val keys = dim.select(col(dimCol).as("__k")).distinct()
        parts += df.select(col(c).as("__v"))
          .join(keys, col("__v") === col("__k"), "left")
          .agg(count(lit(1)).as("n_checked"),
               sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
    }
    parts.reduce(_ unionByName _)
      .select(col("rule"), col("n_checked"), col("n_violations"))
  }

  /** Rows violating ANY row rule, with the comma-joined names of every
    * rule they failed — the quarantine-with-attribution dual of
    * [[report]]; map-side only.
    */
  def quarantine(df: DataFrame, rules: Seq[RowRule],
                 keepCols: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "expectations: empty rule set")
    val failed = concat_ws(",",
      rules.map(r => when(violated(r), lit(r.name))): _*)
    df.select(keepCols.map(col) :+ failed.as("failed_rules"): _*)
      .filter(col("failed_rules") =!= "")
  }
}
