package graft

import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._

/** J6 semantics with the reference's real cases (FIXTURES.md §1):
  * space/colon variants, bracketed tags, Korean regex class 가-힣.
  */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTitle strips bracketed segments, keeps Korean, collapses whitespace") {
    val df = Seq("[퀴어] 어벤져스:  엔드게임!!", "<판타스틱4> 굿즈").toDF("t")
    val out = df.select(FuzzyMatch.normalizeTitle(col("t"))).as[String].collect()
    assert(out(0) == "어벤져스 엔드게임")
    assert(out(1) == "굿즈")
  }

  test("containment match ignores separators; ai_agent.py:97 space-variant case") {
    val queries = Seq("어벤져스 엔드게임 대개봉").toDF("title")
    val movies = Seq("어벤져스엔드게임", "어벤져스", "엔드게임").toDF("movie_nm")
    val out = FuzzyMatch.bestMatch(queries, "title", movies, "movie_nm")
      .select("matched").as[String].collect()
    // min |len diff| picks the full-title candidate over the shorter fragments
    assert(out.head == "어벤져스엔드게임")
  }

  test("unmatched input falls back to itself") {
    val queries = Seq("완전히 새로운 영화").toDF("title")
    val movies = Seq("하얼빈").toDF("movie_nm")
    val out = FuzzyMatch.bestMatch(queries, "title", movies, "movie_nm")
      .select("matched").as[String].collect()
    assert(out.head == "완전히 새로운 영화")
  }

  test("bestMatchByEditDistance: typo match, damage bound, multiplicity") {
    val probes = Seq("kitten", "kitten", "zzzzzz").toDF("probe")
    val cands = Seq("sitting", "mitten", "kit").toDF("name")
    val out = FuzzyMatch.bestMatchByEditDistance(probes, "probe", cands, "name",
        maxDistance = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .sortBy(_._1).toSeq
    // kitten→mitten d=1 (sitting d=3, kit d=3); duplicates keep their
    // own rows; zzzzzz's best exceeds the bound → falls back, null dist
    assert(out == Seq(("kitten", "mitten", 1), ("kitten", "mitten", 1),
                      ("zzzzzz", "zzzzzz", -1)))
  }

  test("bestMatchByEditDistance: EMPTY candidate set still emits every " +
      "query via the phase-4 fallback (round-8 advice)") {
    val probes = Seq("kitten", "zzzzzz").toDF("probe")
    val empty = Seq.empty[String].toDF("name")
    val out = FuzzyMatch.bestMatchByEditDistance(probes, "probe", empty, "name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.isNullAt(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(("kitten", "kitten", true), ("zzzzzz", "zzzzzz", true)))
  }

  test("tie-break is deterministic: shorter then lexicographic candidate") {
    val queries = Seq("abcd").toDF("title")
    val movies = Seq("ab", "cd", "bc").toDF("movie_nm")  // equal length diff
    val out = FuzzyMatch.bestMatch(queries, "title", movies, "movie_nm")
      .select("matched").as[String].collect()
    assert(out.head == "ab")
  }

  test("duplicate query rows each keep their own output row (ADVICE r1)") {
    val queries = Seq("어벤져스", "어벤져스", "하얼빈").toDF("title")
    val movies = Seq("어벤져스엔드게임", "하얼빈").toDF("movie_nm")
    val out = FuzzyMatch.bestMatch(queries, "title", movies, "movie_nm")
    assert(out.count() == 3)
    assert(out.filter(col("title") === "어벤져스").count() == 2)
  }

  // --- phased matcher (movie_events_scraper.py:64-125) ---

  private def phased(titles: Seq[String], recent: Seq[String],
                     catalog: Seq[String]): Map[String, String] = {
    val out = FuzzyMatch.phasedBestMatch(
      titles.toDF("title"), "title",
      recent.toDF("movie_nm"), "movie_nm",
      catalog.toDF("movie_nm"), "movie_nm")
    out.select("title", "matched").as[(String, String)].collect().toMap
  }

  test("phase order is semantic: recent hit beats a closer catalog hit") {
    // catalog's best for '엔드게임' is the exact-length '엔드게임' (diff 0);
    // the reference still returns the RECENT candidate first (ref :104-106
    // only consults the full table when phase 1 found nothing)
    val m = phased(Seq("엔드게임 <굿즈>"),
      recent = Seq("어벤져스 엔드게임"),
      catalog = Seq("엔드게임", "어벤져스 엔드게임"))
    assert(m("엔드게임 <굿즈>") == "어벤져스 엔드게임")
  }

  test("phase 2 catalog fallback when recent misses") {
    val m = phased(Seq("하얼빈 대개봉"),
      recent = Seq("어벤져스"),
      catalog = Seq("하얼빈 대개봉 기념", "다른 영화"))
    assert(m("하얼빈 대개봉") == "하얼빈 대개봉 기념")
  }

  test("no match anywhere falls back to the NORMALIZED title (ref :127)") {
    val m = phased(Seq("[단독] 완전히: 새로운 영화!!"),
      recent = Seq("어벤져스"), catalog = Seq("하얼빈"))
    assert(m("[단독] 완전히: 새로운 영화!!") == "완전히 새로운 영화")
  }

  test("empty-normalizing input yields empty string (ref :66)") {
    val m = phased(Seq("[2024] <이벤트> !!"),
      recent = Seq("어벤져스"), catalog = Seq("하얼빈"))
    assert(m("[2024] <이벤트> !!") == "")
  }

  test("phased match preserves duplicate query multiplicity") {
    val out = FuzzyMatch.phasedBestMatch(
      Seq("어벤져스", "어벤져스", "하얼빈").toDF("title"), "title",
      Seq("어벤져스 엔드게임").toDF("movie_nm"), "movie_nm",
      Seq("하얼빈").toDF("movie_nm"), "movie_nm")
    assert(out.count() == 3)
    assert(out.filter(col("title") === "어벤져스").count() == 2)
  }

  test("tie-break DELTA vs reference pinned (SURVEY §7.5): policy disagreement fixture") {
    // The reference keeps candidate-LIST order on score ties:
    // found_matches.sort(key=lambda x: x[1]) is a STABLE sort on the
    // similarity score alone, and [0][0] takes the first minimal in
    // candidate order (movie_events_scraper.py:88-101). A distributed
    // batch has no candidate order, so our policy is orderBy(score,
    // length, name). This fixture makes the two policies DISAGREE — both
    // candidates contain the query with the same length diff 2 — and
    // asserts our documented deterministic choice: the reference,
    // iterating ["zz 엔드게임", "aa 엔드게임"] in that order, would
    // return "zz 엔드게임"; we return the lexicographically smaller
    // "aa 엔드게임". Documented divergence, now pinned rather than latent.
    val m = phased(Seq("엔드게임"),
      recent = Seq("zz 엔드게임", "aa 엔드게임"), catalog = Seq("하얼빈"))
    assert(m("엔드게임") == "aa 엔드게임")
  }

  test("phased matching direction is reference-exact: query contained in candidate") {
    // query LONGER than every candidate and containing one of them — the
    // single-phase bestMatch direction would match; the reference's
    // clean_input-in-movie direction must NOT
    val m = phased(Seq("어벤져스 엔드게임 스페셜 포스터"),
      recent = Seq("어벤져스"), catalog = Seq("어벤져스"))
    assert(m("어벤져스 엔드게임 스페셜 포스터") == "어벤져스 엔드게임 스페셜 포스터")
  }
}
