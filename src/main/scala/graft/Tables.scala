package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated testdata tables (see /root/repo/TESTDATA.md).
  *
  * Design notes (100 TB posture):
  *   - Every loader is a plain parquet scan — Catalyst pushes filters and
  *     prunes columns into the scan, so downstream operators never have to
  *     hand-optimize I/O. On a real cluster these paths would be
  *     partitioned/bucketed table locations; nothing else changes.
  *   - `events.ts` is parquet TIMESTAMP(NANOS). Spark's timestamp type is
  *     microsecond-precision, so a naive read either fails or loses the
  *     sub-microsecond component. We read it losslessly as a Long
  *     (nanoseconds since epoch) via `spark.sql.legacy.parquet.nanosAsLong`;
  *     windows/sorts operate on the integer directly (cheaper than timestamp
  *     comparisons anyway) and [[tsDate]] derives day granularity exactly.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // runtime conf, read at scan-schema conversion time; harmless for the
    // tables that have no nanos columns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** ns-since-epoch Long → DateType, integer-exact (never routes the epoch
    * through a double — `div` is SQL integral division).
    */
  def tsDate(colName: String): Column =
    to_date(timestamp_seconds(expr(s"$colName div 1000000000")))

  /** Exact-aggregation helper: doubles summed as DECIMAL(38,6) are
    * order-independent, so partial/final aggregation plans (Spark) and
    * single-threaded execution (the DuckDB oracle) produce bit-identical
    * results. The per-row cast itself is deterministic in both engines.
    */
  def dec(c: Column): Column = c.cast("decimal(38,6)")

  /** Exact average that stays deterministic across engines: exact decimal
    * sum → correctly-rounded double → one IEEE division.
    */
  def avgExact(c: Column): Column =
    sum(dec(c)).cast("double") / count(lit(1)).cast("double")

  /** Exact sum exported as DOUBLE. The arithmetic is decimal (order-
    * independent, so Spark's partial aggregation and DuckDB's fold agree
    * exactly); the OUTPUT is double because the harness hashes decimal
    * columns differently per engine (round-1 lesson: every hash-mismatched
    * query had a decimal output column, every match had none). An exact
    * decimal → double cast is correctly rounded in both engines, so the
    * exported bits are identical.
    */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")
}
