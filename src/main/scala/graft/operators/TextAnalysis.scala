package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operator pack for large-scale training-data pipelines:
  * tokenization stats, quality scoring, heuristic language ID, document
  * fingerprinting, SimHash. All built-ins / higher-order functions — no
  * UDFs — so everything stays in whole-stage codegen and scales linearly
  * with the scan (no shuffle except where grouping is the point).
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (deterministic, codegen'd). */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  /** Type–token stats: token count, distinct count, type-token ratio. */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame =
    Stage.spread(df).withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("n_unique", size(array_distinct(col("__toks"))))
      .withColumn("ttr",
        col("n_unique").cast("double") / col("n_tokens").cast("double"))
      .drop("__toks")

  /** Stopword list used by the quality and language heuristics. */
  val EnStopwords: Seq[String] = Seq("the", "a", "is", "and", "of", "to", "in")

  /** Quality scoring à la pretraining-corpus filters: token count,
    * average token length, stopword ratio → one [0,1] score. The exact
    * double arithmetic (fixed operation order) is reproduced in oracles.
    */
  def withQuality(df0: DataFrame, textCol: String): DataFrame = {
    val df = Stage.spread(df0)
    val stopArr = array(EnStopwords.map(lit): _*)
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("sum_token_len", length(regexp_replace(col(textCol), " ", "")))
      .withColumn("avg_token_len",
        col("sum_token_len").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        size(filter(col("__toks"), x => array_contains(stopArr, x))).cast("double")
          / col("n_tokens").cast("double"))
      .withColumn("quality_score",
        greatest(lit(0.0), least(lit(1.0),
          col("stop_ratio") * 0.3
            + least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.4
            + least(lit(1.0), col("avg_token_len") / 8.0) * 0.3)))
      .drop("__toks")
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic preference order en > es > fr > de on ties.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val withHits = LangStopwords.foldLeft(
      Stage.spread(df).withColumn("__toks", tokens(col(textCol)))) { case (d, (lang, words)) =>
      val arr = array(words.map(lit): _*)
      d.withColumn(s"${lang}_hits",
        size(filter(col("__toks"), x => array_contains(arr, x))))
    }
    withHits.withColumn("detected",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits")
          && col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
        .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits")
          && col("es_hits") > 0, "es")
        .when(col("fr_hits") >= col("de_hits") && col("fr_hits") > 0, "fr")
        .when(col("de_hits") > 0, "de")
        .otherwise("und"))
      .drop("__toks")
  }

  /** Normalization fingerprint (rolling-hash analog): md5 of the text with
    * everything but [a-z0-9] removed — catches whitespace/punctuation
    * near-dups exactly.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** 64-bit SimHash over whitespace tokens, built portably from md5 hex
    * digits (so the DuckDB oracle reproduces it bit-for-bit):
    * bit_j(token) = ((hexdigit_{j/4}(md5(token)) >> (3-j%4)) & 1);
    * simhash_j = [ Σ_tokens (2·bit_j − 1) ≥ 0 ].
    * Output: 64-char '0'/'1' string, MSB-first by j.
    *
    * Scale: explode(tokens × 64) is map-side only; the per-doc reduce is
    * one hash aggregation — linear in corpus size, no pairwise work.
    */
  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Stage.spread(df).select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol))
      .agg(graft.functions.SimhashAgg(df.sparkSession, md5(col("tok"))).as("simhash"))

  /** Built-ins-only formulation of the same fingerprint (64 parallel
    * bit-balance sums) — kept as the cross-check for [[withSimhash]]'s
    * native aggregate and as the shape the DuckDB oracle mirrors.
    */
  def withSimhashSql(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perToken = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val balances = (0 until 64).map { j =>
      sum(expr(s"shiftright(instr('0123456789abcdef', substring(h, ${1 + j / 4}, 1)) - 1, ${3 - j % 4}) % 2") * 2 - 1)
        .as(s"bal_$j")
    }
    perToken.groupBy(col(idCol))
      .agg(balances.head, balances.tail: _*)
      .withColumn("simhash",
        concat((0 until 64).map(j =>
          when(col(s"bal_$j") >= 0, "1").otherwise("0")): _*))
      .select(col(idCol), col("simhash"))
  }
}
