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

  // The Megabox feed's bracket convention differs from Lotte's: EITHER
  // delimiter pair — '<...>' or '[...]' (or mixed, per the reference's
  // character classes) — and the lazy group may be empty. ONE pair of
  // delimiter classes feeds both the title EXTRACT and the goods-name
  // STRIP, so a future delimiter addition can't update one and silently
  // leave the other behind.
  private val MbOpen = "[<\\[]"
  private val MbClose = "[>\\]]"
  private val MegaboxBracket = s"$MbOpen(.*?)$MbClose"
  private val MegaboxStrip = s"\\s*$MbOpen.*?$MbClose\\s*"

  /** Megabox movie-title extract (ref: movie_events_scraper.py:736-746):
    * the first `<...>`/`[...]` segment of the (already HTML-unescaped —
    * F14 is a source-adapter concern) goods name, falling back to the
    * event title when the goods name carries none. The reference's
    * falsy check (`if not movie_title`) runs AFTER
    * `_normalize_movie_title`'s cleanup prefix (:56-61: strip bracket
    * segments, then every char outside 한글/alnum/space, then collapse
    * whitespace) — so a non-blank extract made of ONLY special
    * characters (e.g. `<!!>`) also falls through to the event title.
    * Mirrored here: the null test applies that cleanup to the trimmed
    * segment, while the VALUE kept is the raw trimmed segment — the
    * catalog ladder downstream
    * ([[graft.operators.FuzzyMatch.phasedBestMatch]], the reference's
    * `_normalize_movie_title` body :62-127) does its own normalization.
    */
  def megaboxMovieTitle(goodsName: Column, eventTitle: Column): Column = {
    def seg(c: Column): Column = {
      val m = trim(regexp_extract(c, MegaboxBracket, 1))
      val cleaned = trim(regexp_replace(
        regexp_replace(m, MegaboxBracket, ""), "[^가-힣a-zA-Z0-9\\s]", ""))
      when(length(cleaned) > 0, m)
    }
    coalesce(seg(goodsName), seg(eventTitle))
  }

  /** Megabox goods-name rule (ref :748-753): when a movie title was
    * found, the goods name is the goods name with every bracket segment
    * (and surrounding whitespace) stripped; if THAT strips to empty, the
    * same rule applies to the event title instead. With no movie title,
    * the goods name passes through untouched. `movieTitle` is the
    * [[megaboxMovieTitle]] result — the reference branches on the same
    * derived value.
    */
  def megaboxGoodsName(movieTitle: Column, goodsName: Column,
                       eventTitle: Column): Column = {
    def strip(c: Column): Column =
      trim(regexp_replace(c, MegaboxStrip, ""))
    val g = strip(goodsName)
    when(movieTitle.isNull, goodsName)
      .otherwise(when(length(g) > 0, g).otherwise(strip(eventTitle)))
  }

  /** Megabox period split (ref :756-758): `'start ~ end'` → trimmed
    * (start_date, end_date) struct. Python's `period.split('~')` always
    * yields at least one element, so start_date mirrors element 1 even
    * when blank; end_date is element 2 when present, else null (extra
    * `~` segments beyond the second are dropped, like `dates[1]`). A
    * null period yields a null-fielded struct.
    */
  def megaboxPeriodDates(period: Column): Column = {
    val parts = split(period, "~")
    struct(
      trim(element_at(parts, 1)).as("start_date"),
      when(size(parts) >= 2, trim(element_at(parts, 2))).as("end_date"))
  }
}
