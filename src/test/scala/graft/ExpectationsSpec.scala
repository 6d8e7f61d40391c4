package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.{RefIntegrity, RowRule, Unique}

class ExpectationsSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "O", 10.0), (2L, "F", -5.0), (3L, "X", 20.0),
      (4L, null, 30.0), (4L, "O", null), (null, "O", 10.0)
    ).toDF("id", "status", "amount")
  }

  test("NULL predicate result counts as a violation, not a silent pass") {
    val rep = Expectations.report(fixture, Seq(
        Expectations.inRange("amount", 0, 25),
        Expectations.inSet("status", Seq("O", "F")),
        Expectations.notNull("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // amount: -5 out of range, 30 out of range, NULL -> violation = 3
    assert(rep("in_range_amount") == (6L, 3L))
    // status: 'X' and NULL -> 2
    assert(rep("in_set_status") == (6L, 2L))
    assert(rep("not_null_id") == (6L, 1L))
  }

  test("Unique counts rows beyond the first per key; RefIntegrity flags unmatched and NULL FKs") {
    import spark.implicits._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val rep = Expectations.report(fixture, Seq(
        Unique("unique_id", Seq("id")),
        RefIntegrity("id_in_dim", "id", dim, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ids: 1,2,3,4,4,NULL -> 6 rows, 5 distinct keys (NULL is its own
    // struct key) -> 1 duplicate row
    assert(rep("unique_id") == (6L, 1L))
    // 4 matches nothing, 4 again, NULL cannot prove membership -> 3
    assert(rep("id_in_dim") == (6L, 3L))
  }

  test("quarantine attributes EVERY failed rule and drops clean rows") {
    val q = Expectations.quarantine(fixture, Seq(
        Expectations.inRange("amount", 0, 25),
        Expectations.inSet("status", Seq("O", "F"))),
        keepCols = Seq("id"))
      .orderBy(col("id").asc_nulls_last, col("failed_rules"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
    // (1,O,10) and (NULL,O,10) are clean and must NOT appear
    assert(q == Seq(
      (Some(2L), "in_range_amount"),               // -5 below range
      (Some(3L), "in_set_status"),                 // 'X' outside set
      (Some(4L), "in_range_amount"),               // NULL amount
      (Some(4L), "in_range_amount,in_set_status")  // 30 above + NULL status
    ), s"unexpected quarantine: $q")
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.report(fixture, Seq(
        RowRule("r", col("id").isNotNull), RowRule("r", col("status").isNotNull)))
    }
  }
}
