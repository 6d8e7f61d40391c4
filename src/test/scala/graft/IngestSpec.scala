package graft

import graft.operators.Ingest
import java.sql.Date

/** ST1 — watermark + gap fill (kobis_pipeline.py:14-49): resume at max+1,
  * bootstrap window when empty, empty spine when up to date.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("resumes at watermark+1 up to asOf") {
    val store = Seq("2025-01-01", "2025-01-05").map(Date.valueOf).toDF("target_dt")
    val out = Ingest.missingDates(store, "target_dt", "2025-01-08")
      .orderBy("d").as[Date].collect().map(_.toString)
    assert(out.toSeq == Seq("2025-01-06", "2025-01-07", "2025-01-08"))
  }

  test("bootstraps last N days when the store is empty") {
    val store = Seq.empty[Date].toDF("target_dt")
    val out = Ingest.missingDates(store, "target_dt", "2025-01-10", bootstrapDays = 7)
      .orderBy("d").as[Date].collect().map(_.toString)
    assert(out.length == 7)
    assert(out.head == "2025-01-04" && out.last == "2025-01-10")
  }

  test("up-to-date store yields an empty spine") {
    val store = Seq("2025-01-10").map(Date.valueOf).toDF("target_dt")
    val out = Ingest.missingDates(store, "target_dt", "2025-01-10").collect()
    assert(out.isEmpty)
  }
}
