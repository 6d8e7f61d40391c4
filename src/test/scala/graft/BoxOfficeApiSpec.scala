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
}
