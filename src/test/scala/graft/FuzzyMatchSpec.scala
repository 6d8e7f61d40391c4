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
}
