package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-first JSONL landing-zone ingest with corrupt-line quarantine —
  * the ingestion contract every at-scale document pipeline needs and the
  * KOBIS adapters' fixtures never exercise (their JSON is well-formed by
  * construction): real crawler/exporter JSONL carries truncated lines,
  * invalid escapes, and schema drift, and a reader that either throws
  * (FAILFAST) or silently nulls (DROPMALFORMED) loses data or hides
  * loss. PERMISSIVE mode + an explicit corrupt-record column keeps every
  * input line accounted for: parseable lines land typed, unparseable
  * lines land whole in `corrupt_record` for a quarantine table —
  * the same split-don't-drop posture as
  * [[graft.operators.Expectations.quarantine]].
  *
  * Scale: schema-first (no inference scan — at 100 TB an inference pass
  * is a full extra read), line-splittable (JSONL shards across
  * executors; a multi-line JSON array would serialize per file), and
  * the quarantine split is one map-side filter each — the
  * corrupt-column restriction (Spark disallows queries referencing ONLY
  * the internal corrupt column) is satisfied by always selecting the
  * data columns alongside.
  */
object JsonlSource {

  val CorruptCol = "corrupt_record"

  /** Read `path` as JSONL against `schema`; the result carries every
    * schema column plus [[CorruptCol]] (null for clean rows, the raw
    * line for unparseable ones).
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a '$CorruptCol' column")
    // persisted because Spark REFUSES plans that reference only the
    // corrupt column of a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
    // CORRUPT_RECORD_COLUMN — the parse that fills it would otherwise be
    // pruned away with the data columns); caching the parsed result is
    // the documented remedy, and OpCache scopes the release. At 100 TB
    // the equivalent posture is write-then-split: land the parsed frame
    // (data + corrupt column) once, split from the landed copy.
    graft.operators.OpCache.persist(
      spark.read
        .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path))
  }

  /** The clean/quarantine split: (typed rows, rejected raw lines). */
  def split(ingested: DataFrame): (DataFrame, DataFrame) = {
    val clean = ingested.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantined = ingested.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantined)
  }
}
