package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The corrupt-line quarantine contract: every input line lands exactly
  * once — typed or quarantined, never dropped, never thrown.
  */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def write(lines: Seq[String]): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_jsonl_")
      .resolve("in.jsonl")
    java.nio.file.Files.writeString(p, lines.mkString("\n"))
    p.toString
  }

  private def readSplit(lines: Seq[String]) = {
    val (c, q) = JsonlSource.split(
      JsonlSource.readWithQuarantine(spark, write(lines), schema))
    val clean = c.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0),
       if (r.isNullAt(1)) null else r.getString(1))).toSet
    val bad = q.collect().map(_.getString(0)).toSet
    graft.operators.OpCache.clear()
    (clean, bad)
  }

  test("typed, missing-field, and malformed lines split exactly") {
    val (clean, bad) = readSplit(Seq(
      """{"id": 1, "v": "a"}""",
      """{"id": 2}""",          // missing field → null, NOT corrupt
      """{"id": 3, "v":""",     // truncated → quarantined whole
      """garbage"""))           // non-JSON → quarantined whole
    assert(clean == Set((1L, "a"), (2L, null)))
    assert(bad == Set("""{"id": 3, "v":""", "garbage"))
  }

  test("an all-clean file quarantines nothing; an all-corrupt file types nothing") {
    val (c1, b1) = readSplit(Seq("""{"id": 7, "v": "x"}"""))
    assert(c1 == Set((7L, "x")) && b1.isEmpty)
    val (c2, b2) = readSplit(Seq("oops", "also not json"))
    assert(c2.isEmpty && b2 == Set("oops", "also not json"))
  }

  test("a schema already carrying the corrupt column is rejected loudly") {
    val badSchema = schema.add(StructField(JsonlSource.CorruptCol, StringType))
    intercept[IllegalArgumentException] {
      JsonlSource.readWithQuarantine(spark, "/tmp/nope.jsonl", badSchema)
    }
  }
}
