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

  test("FOUND (round-9 sweep, seed 31337): window ORDER BY keys must be " +
      "unique within the partition — LAG/ROWS frames across a tie are " +
      "engine-dependent") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    // l_orderkey is NOT unique in lineitem (one row per line, several
    // lines per order): a window ordered only by it leaves the within-tie
    // row order unspecified, so LAG deltas and ROWS-frame prefix sums are
    // a per-engine choice, not a value — the sweep caught Spark and
    // DuckDB disagreeing on exactly this shape (sqlsweep_seed31337.json
    // before the grammar fix). This is the windowed analog of the block-D
    // "non-total ORDER BY multiset" lesson. The grammar now draws window
    // order keys only from per-table UNIQUE columns.
    //
    // Pin the UNDERLYING fact the rule rests on, so a testdata
    // regeneration that made l_orderkey unique would surface and let the
    // shape be re-admitted: l_orderkey must stay non-unique…
    val dups = spark.sql(
      """SELECT l_orderkey FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 1""".stripMargin)
    assert(dups.count() > 0L,
      "l_orderkey became unique in lineitem — the sqlfuzz window-key " +
        "rule's justification is gone; re-examine the excluded branches")
    // …while the keys the grammar DOES use are unique (the property the
    // portable window templates rely on)
    Seq("orders" -> "o_orderkey", "events" -> "event_id",
        "customer" -> "c_custkey").foreach { case (t, k) =>
      assert(spark.sql(
        s"SELECT $k FROM $t GROUP BY $k HAVING COUNT(*) > 1").count() == 0L,
        s"$t.$k is no longer unique — window templates ordering by it " +
          "are nondeterministic")
    }
  }
}
