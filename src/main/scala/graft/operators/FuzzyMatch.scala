package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6 — similarity / fuzzy containment join (ref:
  * movie_events_scraper.py:56-128 `_normalize_movie_title` + candidate
  * matching): normalize a messy title (strip `[..]`/`<..>` segments, keep
  * `[가-힣a-zA-Z0-9\s]`, collapse whitespace), then match candidates by
  * substring containment after removing separators (' ', ':', '_'),
  * scoring by length difference with shortest-candidate tie-break; an
  * unmatched input falls back to itself.
  *
  * Spark shape: all-built-in `regexp_replace`/`translate` normalization
  * (codegen'd, no UDF) + a broadcast theta-join on `contains` + a
  * row_number window to pick the best candidate. The candidate side is a
  * dimension (movie catalog ≈ 10³ rows), so the fact side streams through
  * a BroadcastNestedLoopJoin without shuffling — at 100 TB the scan stays
  * embarrassingly parallel and the window partitions by the query key.
  */
object FuzzyMatch {

  /** F9 normalization chain (movie_events_scraper.py:58-62). */
  def normalizeTitle(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(c, "[<\\[].*?[>\\]]", " "),
        "[^가-힣a-zA-Z0-9\\s]", ""),
      "\\s+", " "))

  /** Separator removal before containment (movie_events_scraper.py:86). */
  def stripSeparators(c: Column): Column = translate(c, " :_", "")

  /** For each row of `queries`, the best containment match from
    * `candidates` (or the original string when nothing matches).
    * Deterministic: score = |len(cand_clean) − len(query_clean)|, ties by
    * shorter then lexicographically smaller candidate (SURVEY §7.5 makes
    * the reference's first-in-candidate-order pick deterministic).
    */
  def bestMatch(queries: DataFrame, qCol: String,
                candidates: DataFrame, candCol: String): DataFrame = {
    val spark = queries.sparkSession
    // per-row id so duplicate query values each keep their own output row
    // (the window below partitions by this id, not the query value)
    val q = queries
      .withColumn("__qid", monotonically_increasing_id())
      .withColumn("__qc", stripSeparators(normalizeTitle(col(qCol))))
    val cand = candidates
      .select(col(candCol))
      .distinct()
      .withColumn("__cc", stripSeparators(col(candCol)))
      .filter(length(col("__cc")) > 0)
    // containment via the native codegen'd expression — already-stripped
    // inputs pass through its separator strip unchanged, and the score
    // below needs the stripped lengths anyway
    val joined = q.join(broadcast(cand),
      graft.functions.ContainsIgnoringSeparators(spark, col("__qc"), col("__cc")),
      "left")
    val w = Window.partitionBy(col("__qid")).orderBy(
      abs(length(col("__cc")) - length(col("__qc"))).asc,
      length(col(candCol)).asc,
      col(candCol).asc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("matched", coalesce(col(candCol), col(qCol)))
      .drop("__qid", "__qc", "__cc", "__rn", candCol)
  }
}
