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
}
