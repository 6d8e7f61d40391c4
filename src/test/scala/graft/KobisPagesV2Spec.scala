package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** DataSourceV2 tier of the paginated KOBIS feed (S2/S9): the
  * reference's curPage loop becomes partition planning, and the scan
  * optimizations a driver-side loop cannot express are pinned here —
  * one InputPartition per page, column pruning reaching the reader's
  * schema, LIMIT pushdown bounding which pages are PLANNED at all, and
  * size statistics covering only the planned pages.
  */
class KobisPagesV2Spec extends SparkSpec {

  private def page(items: String) =
    s"""{"movieListResult": {"totCnt": "9", "movieList": [$items]}}"""

  private def item(cd: String, extra: String = ""): String =
    s"""{"movieCd":"$cd","movieNm":"nm-$cd","movieNmEn":"en-$cd",
       | "prdtYear":"2024","openDt":"20240101","typeNm":"장편",
       | "prdtStatNm":"개봉","nationAlt":"한국","genreAlt":"드라마",
       | "repNationNm":"한국","repGenreNm":"드라마"$extra}""".stripMargin

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft_kobis_v2_")
    Files.writeString(d.resolve("page_0001.json"), page(Seq(
      item("A1", """, "directors":[{"peopleNm":"Kim"},{"peopleNm":""}],
                   | "companys":[{"companyCd":"C1","companyNm":"Acme"},
                   |             {"companyCd":"","companyNm":"Ghost"}]""".stripMargin),
      item("A2"), item("A3")).mkString(",")))
    Files.writeString(d.resolve("page_0002.json"), page(Seq(
      item("B1"), item("B2"), item("B3")).mkString(",")))
    Files.writeString(d.resolve("page_0003.json"), page(Seq(
      item("C1"), item("C2"), item("C3")).mkString(",")))
    d
  }

  private def read(pageSize: Int = 3): DataFrame =
    spark.read.format("kobis-pages")
      .option("pageSize", pageSize.toString)
      .option("path", dir.toString).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

  test("short name registers and one partition is planned per page file") {
    val df = read()
    assert(df.count() == 9)
    assert(scanOf(df).inputPartitions.size == 3)
  }

  test("column pruning reaches the reader: scan schema is the projection") {
    val df = read().select("movie_cd", "movie_nm")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq
      == Seq("movie_cd", "movie_nm"))
    assert(df.collect().map(_.getString(0)).sorted.head == "A1")
  }

  test("LIMIT pushdown plans only ceil(limit/pageSize) pages, result exact") {
    val df = read().limit(4)
    // 4 rows at 3 items/page → 2 of the 3 pages planned
    assert(scanOf(df).inputPartitions.size == 2)
    val rows = df.select("movie_cd").collect().map(_.getString(0))
    assert(rows.length == 4)
    // pages are name-ordered, so the planned prefix is deterministic
    assert(rows.toSet.subsetOf(Set("A1", "A2", "A3", "B1", "B2", "B3")))
  }

  test("falsy directors/companys members drop; missing fields are NULL") {
    val r = read().select("movie_cd", "directors", "companys", "movie_nm_en")
      .where("movie_cd = 'A1'").collect().head
    assert(r.getString(1) == """["Kim"]""")
    assert(r.getString(2) == """[{"company_cd":"C1","company_nm":"Acme"}]""")
    val plain = read().select("directors", "companys")
      .where("movie_cd = 'A2'").collect().head
    assert(plain.getString(0) == "[]" && plain.getString(1) == "[]")
  }

  test("scan statistics cover only the planned pages") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val all = scanOf(read()).scan.asInstanceOf[SupportsReportStatistics]
      .estimateStatistics().sizeInBytes().getAsLong
    val limited = scanOf(read().limit(1)).scan
      .asInstanceOf[SupportsReportStatistics]
      .estimateStatistics().sizeInBytes().getAsLong
    assert(limited > 0 && limited < all)
  }
}
