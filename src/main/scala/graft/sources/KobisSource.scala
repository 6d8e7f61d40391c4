package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source adapters for the KOBIS JSON feeds (SURVEY §2.1 S1/S2/S9).
  *
  * The reference fetches these over HTTP and eagerly normalizes with
  * pandas (`/root/reference/src/boxoffice/logic/kobisdata_extractor.py`);
  * here the HTTP fetch is replaced by JSON fixture files — the
  * deterministic stand-in SURVEY prescribes — and every transform is a
  * lazy Catalyst projection:
  *
  *   - nested drill `["boxOfficeResult","dailyBoxOfficeList"]`
  *     (kobisdata_extractor.py:34-46) → schema-first read + one
  *     `explode`;
  *   - camelCase→snake_case key rename (utils.py:4-9) → column aliases,
  *     a pure schema op;
  *   - pagination `curPage=1..n` (kobisdata_extractor.py:56-91) →
  *     disappears: Spark reads every page file in one multi-path scan
  *     (same collapse as the Supabase LIMIT/OFFSET loop, S9);
  *   - errors='coerce' casts + fillna(0) (utils.py:27-39) → `try_cast`
  *     + `coalesce`, honoring Spark 4 ANSI mode;
  *   - `elapsed_dt` day difference (kobisdata_extractor.py:149) →
  *     `datediff`.
  *
  * At 100 TB the fixture paths become a partitioned landing zone and
  * nothing else changes: the read is schema-first (no inference scan),
  * filters/projections push into the scan, and per-file work
  * parallelizes across executors.
  */
object KobisSource {

  /** camelCase → snake_case, same two-step rule as the reference
    * (utils.py:4-9): split lower/digit→Upper boundaries, lowercase.
    */
  def camelToSnake(name: String): String = {
    val s1 = "(.)([A-Z][a-z]+)".r.replaceAllIn(name, m => s"${m.group(1)}_${m.group(2)}")
    "([a-z0-9])([A-Z])".r.replaceAllIn(s1, m => s"${m.group(1)}_${m.group(2)}").toLowerCase
  }

  /** Rename every column camelCase→snake_case (schema op, no data op). */
  def snakeCased(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(camelToSnake(c))).toIndexedSeq: _*)

  private def coercedLong(c: Column): Column =
    coalesce(c.try_cast(LongType), lit(0L))
  private def coercedDouble(c: Column): Column =
    coalesce(c.try_cast(DoubleType), lit(0.0))

  /** All KOBIS numerics arrive as JSON strings; these are the ones the
    * reference's type inference lands on int / float
    * (sqlite DDL sqlite_connector.py:26-32 mirrors the same split).
    */
  private val DailyLongCols = Seq("rnum", "rank", "rank_inten", "audi_cnt",
    "audi_inten", "audi_change", "audi_acc", "scrn_cnt", "show_cnt",
    "sales_amt", "sales_inten", "sales_acc")
  private val DailyDoubleCols = Seq("sales_share", "sales_change")

  private val dailyItemFields = Seq(
    "rnum", "rank", "rankInten", "rankOldAndNew", "movieCd", "movieNm",
    "openDt", "salesAmt", "salesShare", "salesInten", "salesChange",
    "salesAcc", "audiCnt", "audiInten", "audiChange", "audiAcc",
    "scrnCnt", "showCnt")

  private val dailySchema = StructType(Seq(StructField("boxOfficeResult",
    StructType(Seq(
      StructField("boxofficeType", StringType),
      StructField("showRange", StringType),
      StructField("dailyBoxOfficeList", ArrayType(
        StructType(dailyItemFields.map(StructField(_, StringType))))))))))

  /** S1 — daily box office for one target date: drill → explode →
    * snake_case → `target_dt` stamp → coercing `open_dt` parse + null
    * drop (P7) → numeric casts (F19) → `elapsed_dt` (F5).
    * Mirrors get_DailyBoxOffice (kobisdata_extractor.py:127-150).
    */
  def dailyBoxOffice(spark: SparkSession, path: String, targetDt: LocalDate): DataFrame = {
    val raw = spark.read.schema(dailySchema).option("multiLine", "true").json(path)
      .select(explode(col("boxOfficeResult.dailyBoxOfficeList")).as("r"))
      .select(col("r.*"))
    val snake = snakeCased(raw)
      .withColumn("target_dt", lit(java.sql.Date.valueOf(targetDt)))
      .withColumn("open_dt", try_to_date(col("open_dt")))
      .filter(col("open_dt").isNotNull)
    val casted = DailyLongCols.foldLeft(snake)((d, c) => d.withColumn(c, coercedLong(col(c))))
    DailyDoubleCols.foldLeft(casted)((d, c) => d.withColumn(c, coercedDouble(col(c))))
      .withColumn("elapsed_dt", datediff(col("target_dt"), col("open_dt")))
  }

  private val movieListSchema = StructType(Seq(StructField("movieListResult",
    StructType(Seq(
      StructField("totCnt", StringType),
      StructField("movieList", ArrayType(StructType(Seq(
        StructField("movieCd", StringType), StructField("movieNm", StringType),
        StructField("movieNmEn", StringType), StructField("prdtYear", StringType),
        StructField("openDt", StringType), StructField("typeNm", StringType),
        StructField("prdtStatNm", StringType), StructField("nationAlt", StringType),
        StructField("genreAlt", StringType), StructField("repNationNm", StringType),
        StructField("repGenreNm", StringType),
        StructField("directors", ArrayType(StructType(Seq(
          StructField("peopleNm", StringType))))),
        StructField("companys", ArrayType(StructType(Seq(
          StructField("companyCd", StringType),
          StructField("companyNm", StringType))))))))))))))

  /** S2/S9 — movie list with the page loop collapsed: every page file is
    * one multi-path scan. Reproduces get_MovieList
    * (kobisdata_extractor.py:77-125): directors → JSON array of
    * `people_nm` (nulls dropped, empty → "[]"), companys → JSON array of
    * `{company_cd, company_nm}` pairs, then the P6 filter (non-adult
    * genre, non-empty English title, at least one director) and the
    * `yyyy-MM-dd` open_dt reformat.
    */
  def movieList(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val raw = spark.read.schema(movieListSchema).option("multiLine", "true")
      .json(paths: _*)
      .select(explode(col("movieListResult.movieList")).as("m"))
      .select(col("m.*"))
    // the reference drops FALSY values (None and "" alike) via
    // `if d.get("people_nm")` / `if c.get(...)` — mirror that, not just
    // null-ness
    val dirNames = filter(
      transform(col("directors"), d => d.getField("peopleNm")),
      x => x.isNotNull && x =!= "")
    val companyPairs = filter(
      transform(col("companys"), c =>
        struct(c.getField("companyCd").as("company_cd"),
               c.getField("companyNm").as("company_nm"))),
      c => c.getField("company_cd").isNotNull && c.getField("company_cd") =!= ""
        && c.getField("company_nm").isNotNull && c.getField("company_nm") =!= "")
    snakeCased(
      raw.withColumn("directors_arr", coalesce(dirNames, array()))
         .withColumn("companys_arr", coalesce(companyPairs, array()))
         .drop("directors", "companys"))
      .withColumn("directors", to_json(col("directors_arr")))
      .withColumn("companys", to_json(col("companys_arr")))
      // null-handling parity with pandas: NaN != '성인물(에로)' is True
      // (row kept) and NaN.astype(str) is the non-empty "nan" (row kept),
      // so nulls must PASS both predicates — Spark's null-propagating
      // =!= would silently drop them
      .filter((col("rep_genre_nm").isNull || col("rep_genre_nm") =!= "성인물(에로)")
        && (col("movie_nm_en").isNull || trim(col("movie_nm_en")) =!= "")
        && size(col("directors_arr")) > 0)
      .withColumn("open_dt", date_format(try_to_date(col("open_dt"), "yyyyMMdd"), "yyyy-MM-dd"))
      .drop("directors_arr", "companys_arr")
  }
}
