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
  *
  * Determinism under retry (round-2 ADVICE): neither operator stamps
  * `monotonically_increasing_id` — duplicate query rows are collapsed
  * with a count, each DISTINCT row matched once, and multiplicity
  * re-expanded afterwards. A speculative / retried task recomputes the
  * identical frame, and hot repeated titles are matched once instead of
  * once per occurrence. (Requires the query frame's columns to be
  * groupable — true for the string-typed feeds this serves.)
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

  /** Collapse duplicate query rows to (distinct row, multiplicity). */
  private def collapsed(queries: DataFrame): DataFrame =
    queries.groupBy(queries.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).cast("int").as("__dup"))

  /** Re-expand multiplicity collapsed by [[collapsed]] and drop helpers. */
  private def expanded(df: DataFrame, helpers: String*): DataFrame =
    df.withColumn("__rep", explode(array_repeat(lit(1), col("__dup"))))
      .drop("__dup" +: "__rep" +: helpers: _*)

  /** For each row of `queries`, the best candidate from `candidates` that
    * the QUERY CONTAINS after separator-stripping (or the original string
    * when nothing matches) — the "extract the known catalog name from a
    * longer messy string" direction; [[phasedBestMatch]] is the
    * reference-exact opposite direction with its phase ladder.
    * Deterministic: score = |len(cand_clean) − len(query_clean)|, ties by
    * shorter then lexicographically smaller candidate (SURVEY §7.5 makes
    * the reference's first-in-candidate-order pick deterministic).
    */
  def bestMatch(queries: DataFrame, qCol: String,
                candidates: DataFrame, candCol: String): DataFrame = {
    val spark = queries.sparkSession
    val q = collapsed(queries)
      .withColumn("__qc", stripSeparators(normalizeTitle(col(qCol))))
    val cand = candidates
      .select(col(candCol))
      .distinct()
      .withColumn("__cc", stripSeparators(col(candCol)))
      .filter(length(col("__cc")) > 0)
    // containment via the native codegen'd expression — already-stripped
    // inputs pass through its separator strip unchanged, and the score
    // below needs the stripped lengths anyway
    val joined = q.join(Hints.bcast(cand),
      graft.functions.ContainsIgnoringSeparators(spark, col("__qc"), col("__cc")),
      "left")
    // partitioned by the (distinct) query row itself: same keys as the
    // groupBy in collapsed(), so the exchange is reused, not repeated
    val w = Window.partitionBy(queries.columns.map(col).toIndexedSeq: _*).orderBy(
      abs(length(col("__cc")) - length(col("__qc"))).asc,
      length(col(candCol)).asc,
      col(candCol).asc)
    val best = joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("matched", coalesce(col(candCol), col(qCol)))
    expanded(best, "__qc", "__cc", "__rn", candCol)
  }

  /** Edit-distance rung of the J6 ladder — the containment matchers
    * can't catch TYPOS (a misspelled title contains nothing from the
    * catalog), so this picks, per query row, the candidate with minimum
    * Levenshtein distance to the normalized query. `maxDistance` bounds
    * acceptable damage: a best candidate further than that falls back
    * to the query itself (the phase-4 convention).
    *
    * Shape mirrors [[bestMatch]]: distinct queries × broadcast distinct
    * candidates scored by the codegen'd built-in `levenshtein` (no
    * UDF), one row_number window partitioned by the query row (exchange
    * reused from the collapse groupBy). The scoring join is inherently
    * |queries|·|candidates| — correct for a catalog-sized dimension;
    * a fact-×-fact edit-distance join needs LSH-style blocking first
    * (the `Dedup` machinery), same caveat as the containment ladder.
    * Deterministic ties: smaller distance, then shorter, then
    * lexicographically smaller candidate.
    */
  def bestMatchByEditDistance(queries: DataFrame, qCol: String,
                              candidates: DataFrame, candCol: String,
                              maxDistance: Int = Int.MaxValue): DataFrame = {
    val q = collapsed(queries)
      .withColumn("__qn", normalizeTitle(col(qCol)))
    val cand = candidates.select(col(candCol)).distinct()
      .filter(length(col(candCol)) > 0)
    // LEFT cross join, not crossJoin: with zero candidates every query
    // row must still reach phase 4 (matched = the query itself) instead
    // of vanishing — the bestMatch/phasedBestMatch fallback contract
    // (round-8 advice)
    val scored = q.join(Hints.bcast(cand), lit(true), "left")
      .withColumn("__d", levenshtein(col("__qn"), col(candCol)))
    val w = Window.partitionBy(queries.columns.map(col).toIndexedSeq: _*).orderBy(
      col("__d").asc_nulls_last, length(col(candCol)).asc, col(candCol).asc)
    val best = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("matched",
        when(col("__d") <= maxDistance, col(candCol)).otherwise(col(qCol)))
      .withColumn("distance",
        when(col("__d") <= maxDistance, col("__d")).otherwise(lit(null)))
    expanded(best, "__qn", "__d", "__rn", candCol)
  }

  /** Reference-exact phased matcher (movie_events_scraper.py:64-125):
    *
    *   phase 1 — candidates = recent box-office ∪ opening-soon names
    *             (`recentNames`); stripped-containment
    *             `query_clean ⊆ cand_clean`, best = min
    *             (len(cand_clean) − len(query_clean));
    *   phase 2 — same match against the FULL catalog;
    *   phase 3 — raw containment of the normalized (still-spaced) title
    *             in the RAW catalog name, shortest candidate wins;
    *   phase 4 — no match anywhere → the normalized title itself
    *             (empty-normalizing inputs yield "", ref :66).
    *
    * The phase ORDER is semantic: a recent-title hit beats a closer
    * full-catalog hit (ref picks phase 1's best before ever consulting
    * the catalog). Phase 3 is provably subsumed by phase 2 (separator
    * stripping maps a contiguous raw match to a contiguous stripped
    * match) but is kept for line-by-line parity and as a guard if the
    * stripped predicate ever diverges.
    *
    * Shape: ONE broadcast theta-join against the phase-tagged union of
    * candidate sets + ONE row_number window ordered (phase, score,
    * shortest, name) — not three sequential join+coalesce passes, so the
    * fact side is scanned once and never shuffled beyond the final
    * per-query pick.
    */
  def phasedBestMatch(queries: DataFrame, qCol: String,
                      recentNames: DataFrame, recentCol: String,
                      catalog: DataFrame, catalogCol: String): DataFrame = {
    val spark = queries.sparkSession
    val q = collapsed(queries)
      .withColumn("__qn", normalizeTitle(col(qCol)))
      .withColumn("__qc", stripSeparators(col("__qn")))
    val cat = catalog.select(col(catalogCol).as("__cand")).distinct()
    val cands = recentNames.select(col(recentCol).as("__cand")).distinct()
      .withColumn("__phase", lit(1))
      .unionByName(cat.withColumn("__phase", lit(2)))
      .unionByName(cat.withColumn("__phase", lit(3)))
      .withColumn("__cc", stripSeparators(col("__cand")))
      .filter(length(col("__cc")) > 0)
    // phases 1-2: stripped candidate CONTAINS stripped query (the
    // reference's `clean_input in cleaned_movie`); phase 3: raw candidate
    // contains the normalized, still-spaced title
    val cond =
      (col("__phase") <= 2 && length(col("__qc")) > 0 &&
        graft.functions.ContainsIgnoringSeparators(spark, col("__cc"), col("__qc"))) ||
      (col("__phase") === 3 && length(col("__qn")) > 0 &&
        col("__cand").contains(col("__qn")))
    val joined = q.join(Hints.bcast(cands), cond, "left")
    val score = when(col("__phase") <= 2, length(col("__cc")) - length(col("__qc")))
      .otherwise(length(col("__cand")))
    val w = Window.partitionBy(queries.columns.map(col).toIndexedSeq: _*).orderBy(
      col("__phase").asc_nulls_last, score.asc, length(col("__cand")).asc,
      col("__cand").asc)
    val best = joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("matched",
        when(length(col("__qn")) === 0, lit(""))
          .otherwise(coalesce(col("__cand"), col("__qn"))))
    expanded(best, "__qn", "__qc", "__cc", "__rn", "__phase", "__cand")
  }
}
