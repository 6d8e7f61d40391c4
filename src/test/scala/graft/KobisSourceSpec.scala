package graft

import java.nio.file.Files

import graft.sources.KobisSource

class KobisSourceSpec extends SparkSpec {

  private def writeFixture(name: String, body: String): String = {
    val dir = Files.createTempDirectory("kobis_fx_")
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }

  test("camelToSnake matches the reference's two-step rule") {
    assert(KobisSource.camelToSnake("movieCd") == "movie_cd")
    assert(KobisSource.camelToSnake("rankOldAndNew") == "rank_old_and_new")
    assert(KobisSource.camelToSnake("audiAcc") == "audi_acc")
    assert(KobisSource.camelToSnake("openDt") == "open_dt")
    assert(KobisSource.camelToSnake("HTTPCode2Xx") == "http_code2_xx")
  }

  test("dailyBoxOffice drills, renames, stamps, coerces and derives elapsed_dt") {
    val fixture = writeFixture("daily.json",
      """{"boxOfficeResult":{"boxofficeType":"일별 박스오피스","showRange":"20250720~20250720",
        |"dailyBoxOfficeList":[
        |{"rnum":"1","rank":"1","rankInten":"0","rankOldAndNew":"OLD","movieCd":"20240001",
        | "movieNm":"테스트영화","openDt":"2025-07-01","salesAmt":"1000000","salesShare":"25.5",
        | "salesInten":"-100","salesChange":"-3.1","salesAcc":"90000000","audiCnt":"1200",
        | "audiInten":"-55","audiChange":"-4","audiAcc":"88000","scrnCnt":"500","showCnt":"1500"},
        |{"rnum":"2","rank":"2","rankInten":"1","rankOldAndNew":"NEW","movieCd":"20240002",
        | "movieNm":"무개봉일","openDt":" ","salesAmt":"x","salesShare":"","salesInten":"0",
        | "salesChange":"0","salesAcc":"0","audiCnt":"0","audiInten":"0","audiChange":"0",
        | "audiAcc":"0","scrnCnt":"0","showCnt":"0"}]}}""".stripMargin)
    val out = KobisSource.dailyBoxOffice(spark, fixture, java.time.LocalDate.of(2025, 7, 20))
    val rows = out.collect()
    assert(rows.length == 1) // blank open_dt coerces to null and is dropped (P7)
    val r = rows.head
    assert(r.getAs[Long]("rank") == 1L && r.getAs[Long]("audi_acc") == 88000L)
    assert(r.getAs[Double]("sales_share") == 25.5)
    assert(r.getAs[String]("rank_old_and_new") == "OLD")
    assert(r.getAs[Int]("elapsed_dt") == 19) // 2025-07-20 minus 2025-07-01
    assert(out.columns.contains("movie_cd") && !out.columns.contains("movieCd"))
  }

  test("movieList collapses pages, encodes nested arrays, applies the P6 filter") {
    val page1 = writeFixture("p1.json",
      """{"movieListResult":{"totCnt":"3","movieList":[
        |{"movieCd":"A1","movieNm":"좋은영화","movieNmEn":"Good Movie","prdtYear":"2024",
        | "openDt":"20240117","typeNm":"장편","prdtStatNm":"개봉","nationAlt":"한국",
        | "genreAlt":"드라마","repNationNm":"한국","repGenreNm":"드라마",
        | "directors":[{"peopleNm":"김감독"}],"companys":[{"companyCd":"C1","companyNm":"회사"}]},
        |{"movieCd":"A2","movieNm":"성인물","movieNmEn":"X","prdtYear":"2024","openDt":"20240201",
        | "typeNm":"장편","prdtStatNm":"개봉","nationAlt":"한국","genreAlt":"성인물(에로)",
        | "repNationNm":"한국","repGenreNm":"성인물(에로)",
        | "directors":[{"peopleNm":"아무개"}],"companys":[]}]}}""".stripMargin)
    val page2 = writeFixture("p2.json",
      """{"movieListResult":{"totCnt":"3","movieList":[
        |{"movieCd":"A3","movieNm":"무감독","movieNmEn":"No Director","prdtYear":"2024",
        | "openDt":"20240301","typeNm":"장편","prdtStatNm":"개봉","nationAlt":"한국",
        | "genreAlt":"코미디","repNationNm":"한국","repGenreNm":"코미디",
        | "directors":[],"companys":null}]}}""".stripMargin)
    val out = KobisSource.movieList(spark, Seq(page1, page2)).collect()
    // A2 dropped (adult genre), A3 dropped (no directors) — reference filter
    assert(out.map(_.getAs[String]("movie_cd")).toSeq == Seq("A1"))
    val r = out.head
    assert(r.getAs[String]("directors") == """["김감독"]""")
    assert(r.getAs[String]("companys") == """[{"company_cd":"C1","company_nm":"회사"}]""")
    assert(r.getAs[String]("open_dt") == "2024-01-17")
  }
}
