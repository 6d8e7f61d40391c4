package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F12 — scraper-feed field-parse rules as engine columns (ref:
  * movie_events_scraper.py:581-593, the Lotte event parser). The
  * reference derives two fields from each raw event row with
  * special-case string rules; here they are codegen'd column
  * expressions, usable in any projection — no UDF, no row iteration.
  */
object EventParse {

  /** The movie title is the first `<...>` segment of the event name
    * (ref :581-582: `re.search(r'<([^<>]+)>', event_name)`), trimmed;
    * NULL when the event name carries no bracketed title — callers
    * typically feed the result to
    * [[graft.operators.FuzzyMatch.phasedBestMatch]].
    */
  def titleInAngleBrackets(eventName: Column): Column = {
    val m = regexp_extract(eventName, "<([^<>]+)>", 1)
    // regexp_extract returns "" on no-match; the reference's no-match is
    // None. A matched-but-blank group can't occur ([^<>]+ is non-empty).
    when(length(m) > 0, trim(m))
  }

  /** The goods name, via the reference's rule ladder (ref :584-593):
    *
    *   1. event name contains '시그니처 아트카드' → that literal;
    *   2. event name contains 'SPECIAL ART CARD' → '스페셜 아트카드';
    *   3. otherwise: strip `<...>` segments from the FULL goods name,
    *      then take the text between the first ',' and the next ')'
    *      (`,\s*(.*?)\s*\)`) when that pattern occurs — the "(week,
    *      variant)" suffix convention — else the stripped name itself.
    *
    * The existence test is separate from the extraction because the
    * reference treats a matched-but-empty group as '' (match object is
    * truthy), which a bare `regexp_extract` cannot distinguish from
    * no-match.
    */
  def lotteGoodsName(eventName: Column, goodsFullName: Column): Column = {
    val cleaned = trim(regexp_replace(goodsFullName, "<[^<>]+>", ""))
    val extracted = regexp_extract(cleaned, ",\\s*(.*?)\\s*\\)", 1)
    when(eventName.contains("시그니처 아트카드"), lit("시그니처 아트카드"))
      .when(eventName.contains("SPECIAL ART CARD"), lit("스페셜 아트카드"))
      .otherwise(when(cleaned.rlike(",\\s*.*?\\s*\\)"), extracted).otherwise(cleaned))
  }
}
