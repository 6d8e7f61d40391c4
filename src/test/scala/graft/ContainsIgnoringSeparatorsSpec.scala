package graft

import graft.functions.ContainsIgnoringSeparators
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ContainsIgnoringSeparatorsSpec extends SparkSpec {
  import spark.implicits._

  test("matches translate+contains composition on literal cases incl. Korean") {
    val rows = Seq(
      ("어벤져스 엔드게임", "어벤져스엔드게임", true),
      ("어벤져스:엔드게임", "어벤져스 엔드게임", true),
      ("a_b:c d", "abcd", true),
      ("abc", "abd", false),
      ("", "", true),
      ("x", "", true)).toDF("h", "n", "expected")
    val got = rows.withColumn("got",
      ContainsIgnoringSeparators(spark, col("h"), col("n")))
    assert(got.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("property: equivalent to stripping both sides then contains (seeded fuzz)") {
    val alphabet = ('a' to 'c') ++ Seq(' ', ':', '_', '가')
    val rnd = new scala.util.Random(42)
    def randStr() = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    def strip(s: String) = s.filterNot(" :_".contains(_))
    (1 to 2000).foreach { _ =>
      val (h, n) = (randStr(), randStr())
      val expected = strip(h).contains(strip(n))
      val got = ContainsIgnoringSeparators.containsStripped(
        UTF8String.fromString(h), UTF8String.fromString(n))
      assert(got == expected, s"h='$h' n='$n'")
    }
  }

  test("null propagation and SQL-surface registration") {
    ContainsIgnoringSeparators.register(spark)
    val out = spark.sql(
      """SELECT contains_ignoring_separators('a b', 'ab') AS t,
                contains_ignoring_separators(NULL, 'x') AS n""").collect().head
    assert(out.getBoolean(0))
    assert(out.isNullAt(1))
  }
}
