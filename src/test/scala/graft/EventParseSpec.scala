package graft

import graft.sources.EventParse
import org.apache.spark.sql.functions._

/** F12 parse rules with the reference's real cases
  * (movie_events_scraper.py:581-593).
  */
class EventParseSpec extends SparkSpec {
  import spark.implicits._

  private def parse(rows: Seq[(String, String)]): Seq[(String, String)] =
    rows.toDF("event_name", "goods_full_name")
      .select(
        EventParse.titleInAngleBrackets(col("event_name")).as("t"),
        EventParse.lotteGoodsName(col("event_name"), col("goods_full_name")).as("g"))
      .as[(String, String)].collect().toSeq

  test("signature art card rule wins over everything in the event name") {
    val out = parse(Seq(
      ("<엔드게임> 시그니처 아트카드 증정", "오리지널 티켓 (1주차, 포스터)")))
    assert(out.head == ("엔드게임", "시그니처 아트카드"))
  }

  test("SPECIAL ART CARD rule maps to the Korean canonical name") {
    val out = parse(Seq(("<위젯> SPECIAL ART CARD EVENT", "anything at all")))
    assert(out.head == ("위젯", "스페셜 아트카드"))
  }

  test("comma-to-paren extraction after stripping <...> segments") {
    val out = parse(Seq(
      ("<기타> 주간 굿즈", "<한정> 오리지널 티켓 (4주차, A3 포스터)")))
    assert(out.head == ("기타", "A3 포스터"))
  }

  test("no comma-paren pattern keeps the stripped goods name; no brackets → null title") {
    val out = parse(Seq(("브래킷 없는 이벤트", "<한정판> 포토카드 세트")))
    assert(out.head == (null, "포토카드 세트"))
  }

  test("matched-but-empty group yields empty string, not the fallback (Python truthy-match parity)") {
    val out = parse(Seq(("행사", "티켓 (,)")))
    assert(out.head == (null, ""))
  }

  // ---- Megabox rules (movie_events_scraper.py:736-758) ----

  private def parseMegabox(rows: Seq[(String, String, String)]): Seq[(String, String, String, String)] =
    rows.toDF("goods_name", "event_title", "period")
      .withColumn("__d", EventParse.megaboxPeriodDates(col("period")))
      .select(
        EventParse.megaboxMovieTitle(col("goods_name"), col("event_title")).as("t"),
        EventParse.megaboxGoodsName(
          EventParse.megaboxMovieTitle(col("goods_name"), col("event_title")),
          col("goods_name"), col("event_title")).as("g"),
        col("__d.start_date"), col("__d.end_date"))
      .as[(String, String, String, String)].collect().toSeq

  test("megabox: square-bracket title from goods name, brackets stripped from goods name") {
    val out = parseMegabox(Seq(
      ("[퀴어] 오리지널 포토카드", "이벤트 안내", "2025.01.01 ~ 2025.01.31")))
    assert(out.head == ("퀴어", "오리지널 포토카드", "2025.01.01", "2025.01.31"))
  }

  test("megabox: angle-bracket title falls back to the event title when the goods name has none") {
    val out = parseMegabox(Seq(
      ("스페셜 배지", "<판타스틱4> 개봉 기념", "2025.07.01~2025.07.15")))
    assert(out.head == ("판타스틱4", "스페셜 배지", "2025.07.01", "2025.07.15"))
  }

  test("megabox: goods name that strips to empty falls back to the stripped event title") {
    val out = parseMegabox(Seq(
      ("<엔드게임>", "<엔드게임> 아트카드 증정", "2025.03.01 ~ 2025.03.31")))
    assert(out.head == ("엔드게임", "아트카드 증정", "2025.03.01", "2025.03.31"))
  }

  test("megabox: no brackets anywhere → null title, goods name untouched; single-date period") {
    val out = parseMegabox(Seq(("포토카드 세트", "주간 이벤트", "2025.05.01")))
    assert(out.head == (null, "포토카드 세트", "2025.05.01", null))
  }

  test("megabox: matched-but-blank bracket falls through to the event title (falsy parity)") {
    // '<>' matches with an empty group — the reference normalizes to ''
    // (falsy) and retries the event title
    val out = parseMegabox(Seq(("<> 굿즈", "[하얼빈] 이벤트", "")))
    assert(out.head == ("하얼빈", "굿즈", "", null))
  }

  test("megabox: special-char-only bracket falls through like blank (post-normalize falsy parity)") {
    // '<!!>' extracts '!!', which the reference's _normalize_movie_title
    // cleanup reduces to '' (falsy) BEFORE the `if not movie_title`
    // check — so it falls back to the event title; with no title match
    // anywhere the goods name must pass through untouched
    val out = parseMegabox(Seq(
      ("<!!> 굿즈", "[하얼빈] 이벤트", ""),
      ("<?!> 아트카드", "특별전", "")))
    assert(out.head == ("하얼빈", "굿즈", "", null))
    assert(out(1) == (null, "<?!> 아트카드", "", null))
  }

  test("megabox: extra ~ segments drop like Python dates[1]; null period → null dates") {
    val out = parseMegabox(Seq(
      ("[A] 카드", "ev", "1 ~ 2 ~ 3"),
      ("[B] 카드", "ev", null.asInstanceOf[String])))
    assert(out == Seq(("A", "카드", "1", "2"), ("B", "카드", null, null)))
  }
}
