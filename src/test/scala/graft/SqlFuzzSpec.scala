package graft

/** Divergences FOUND by the differential SQL fuzzer, pinned Spark-side
  * so the documented behavior can never drift silently. Each test names
  * the fuzz block that surfaced it and the generator rule that now
  * excludes the shape from the portable grammar.
  */
class SqlFuzzSpec extends SparkSpec {

  test("FOUND (block C): grouping sets over EMPTY input emit no rows; DuckDB/Postgres emit the global row") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    // the shape block C generated: a ROLLUP whose WHERE matches nothing.
    // DuckDB (following Postgres and the SQL standard's GROUP BY ())
    // returns ONE row for the grand-total grouping set with COUNT=0;
    // Spark returns ZERO rows. tools/sqlfuzz.py excludes the shape from
    // the portable grammar (accept_loop "empty-input grouping sets").
    val rollup = spark.sql(
      """SELECT o_orderstatus AS k, COUNT(*) AS cnt FROM orders
        |WHERE o_orderkey < 0 GROUP BY ROLLUP(o_orderstatus)""".stripMargin)
    assert(rollup.count() == 0L,
      "Spark's empty-input ROLLUP behavior changed — re-examine the " +
        "sqlfuzz portability rule and consider re-admitting the shape")
    // the neighboring shapes DO agree across engines and stay in-grammar:
    // a global aggregate over empty input is one row...
    assert(spark.sql(
      "SELECT COUNT(*) AS cnt FROM orders WHERE o_orderkey < 0").count() == 1L)
    // ...and a plain GROUP BY over empty input is zero rows
    assert(spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
        |WHERE o_orderkey < 0 GROUP BY o_orderstatus""".stripMargin).count() == 0L)
  }
}
