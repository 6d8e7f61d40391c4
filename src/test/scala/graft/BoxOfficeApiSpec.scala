package graft

import graft.api.BoxOffice
import graft.pipelines.BoxOfficePipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The facade over a freshly-built store: the dashboard/agent surface a
  * reference user would actually call.
  */
class BoxOfficeApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_api_").toString
    val raw = Seq(
      ("m1", "하얼빈", "2024-12-24", "2025-01-01", 340484.0),
      ("m2", "시크릿", "2024-12-30", "2025-01-01", 120000.0),
      ("m1", "하얼빈", "2024-12-24", "2025-01-02", 228000.0))
      .toDF("movie_cd", "movie_nm", "open_dt", "td", "audi_cnt")
      .withColumn("target_dt", to_date(col("td"))).drop("td")
    BoxOfficePipeline.ingestDaily(spark, r, raw, "2025-01-02")
    BoxOfficePipeline.upsertMovies(spark, r,
      Seq(("m1", "하얼빈", "드라마"), ("m2", "시크릿", "코미디"))
        .toDF("movie_cd", "movie_nm", "rep_genre_nm"))
    BoxOfficePipeline.appendStock(spark, r,
      Seq(("e1", "CGV강남", "보유")).toDF("event_id", "theater_name", "status"), 1000L)
    BoxOfficePipeline.appendStock(spark, r,
      Seq(("e1", "CGV강남", "소진중")).toDF("event_id", "theater_name", "status"), 2000L)
    r
  }

  test("periodTopMovies / topDays / genreRollup over the store") {
    val api = new BoxOffice(spark, root)
    val top = api.periodTopMovies("2025-01-01", "2025-01-02", 1).collect()
    assert(top.head.getString(0) == "하얼빈")
    assert(api.topDays("2025-01-01", "2025-01-02", 1).collect()
      .head.getDate(0).toString == "2025-01-01")
    val genres = api.genreRollup("2025-01-01", "2025-01-02")
      .orderBy("rep_genre_nm").collect()
    assert(genres.map(_.getString(0)).toSeq == Seq("드라마", "코미디"))
  }

  test("ask() runs arbitrary SQL against the store views") {
    val api = new BoxOffice(spark, root)
    val n = api.ask(
      "SELECT COUNT(*) AS n FROM boxoffice WHERE REPLACE(movie_nm, ' ', '') LIKE '%하얼빈%'")
      .collect().head.getLong(0)
    assert(n == 2)
  }

  test("dailyTrend and currentStock") {
    val api = new BoxOffice(spark, root)
    assert(api.dailyTrend(Seq("하얼빈")).count() == 2)
    val stock = api.currentStock("e1").collect()
    assert(stock.length == 1) // latest row per theater only
  }

  test("recentCandidateNames: recent box office ∪ opening-soon, minus already-charted") {
    // fresh store so the lazy shared fixture stays untouched
    val r = Files.createTempDirectory("graft_api2_").toString
    val raw = Seq(
      ("m1", "하얼빈", "2024-12-24", "2025-01-02", 100.0),   // recent (asOf-1)
      ("m3", "지난영화", "2024-11-01", "2024-12-20", 50.0))  // old chart entry
      .toDF("movie_cd", "movie_nm", "open_dt", "td", "audi_cnt")
      .withColumn("target_dt", to_date(col("td"))).drop("td")
    BoxOfficePipeline.ingestDaily(spark, r, raw, "2025-01-02")
    BoxOfficePipeline.upsertMovies(spark, r, Seq(
      ("m1", "하얼빈", "2024-12-24"),
      ("m3", "지난영화", "2024-11-01"),
      ("m4", "개봉예정작", "2025-01-05"),   // opening within 7 days of asOf
      ("m5", "먼미래작", "2025-03-01"))     // too far out
      .toDF("movie_cd", "movie_nm", "open_dt"))
    val api = new BoxOffice(spark, r)
    val names = api.recentCandidateNames("2025-01-03").as[String].collect().toSet
    // recent chart name + opening-soon name; NOT the stale chart entry,
    // NOT the far-future release
    assert(names == Set("하얼빈", "개봉예정작"), s"got $names")
  }

  test("ingestGoodsEvents: enrich (store-driven candidates) then upsert goods_event") {
    val r = Files.createTempDirectory("graft_api3_").toString
    val raw = Seq(
      ("m1", "하얼빈", "2024-12-24", "2025-01-02", 100.0))
      .toDF("movie_cd", "movie_nm", "open_dt", "td", "audi_cnt")
      .withColumn("target_dt", to_date(col("td"))).drop("td")
    BoxOfficePipeline.ingestDaily(spark, r, raw, "2025-01-02")
    BoxOfficePipeline.upsertMovies(spark, r,
      Seq(("m1", "하얼빈", "2024-12-24")).toDF("movie_cd", "movie_nm", "open_dt"))
    val api = new BoxOffice(spark, r)

    val events = Seq(
      ("e1", "하얼빈 <대개봉>", "SX 포스터", "2025-01-01", "2025-01-31",
        null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("event_id", "movie_title", "goods_name", "start_date", "end_date",
        "event_url", "image_url")
    val aliases = Seq(("SX 포스터", "SCREENX 포스터")).toDF("raw", "canonical")
    val movieEvents = Seq(
      ("하얼빈", "SCREENX 포스터", "2025-01-01", "2025-01-31", "http://m1", "img1"))
      .toDF("movie_title", "goods_name", "start_date", "end_date", "event_url", "image_url")

    assert(api.ingestGoodsEvents(events, aliases, movieEvents, "2025-01-03") == 1)
    val stored = spark.read.parquet(s"$r/goods_event").collect().head
    assert(stored.getAs[String]("movie_title") == "하얼빈")       // phase-1 match
    assert(stored.getAs[String]("goods_name") == "SCREENX 포스터") // alias applied
    assert(stored.getAs[String]("event_url") == "http://m1")      // key₁ enrichment

    // re-ingest with an updated row: upsert replaces, count stays 1
    val events2 = events.withColumn("image_url", lit("img_new"))
    assert(api.ingestGoodsEvents(events2, aliases, movieEvents, "2025-01-03") == 1)
  }
}
