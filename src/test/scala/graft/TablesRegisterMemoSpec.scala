package graft

import org.apache.spark.sql.functions._

/** Guards the round-15 `registerAll` view-registration memo: skipping the
  * per-call `createOrReplaceTempView`×10 is only sound if the memo
  * re-registers exactly when the underlying plans can differ — a table
  * file overwritten in place (new mtime → new scan-plan instance) or a
  * different sf dir. A memo bug here would silently serve STALE views to
  * every SQL-surface query, so each invalidation edge is pinned
  * behaviorally (what the view reads), not structurally.
  */
class TablesRegisterMemoSpec extends SparkSpec {
  import spark.implicits._

  /** Writes all 10 testdata table names as tiny single-file tables so
    * registerAll can load the full set; `orders` carries `tag` so reads
    * through the view can tell fixture generations apart.
    */
  private def writeFixture(dir: String, tag: String): Unit = {
    Tables.all.foreach { n =>
      val df =
        if (n == "orders") Seq((1L, tag)).toDF("o_orderkey", "tag")
        else Seq((1L, n)).toDF("id", "name")
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
  }

  private def viewTag(): String =
    spark.table("orders").select(col("tag")).head().getString(0)

  test("repeat registerAll serves the same views; overwrite re-registers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_regmemo").toString
    writeFixture(dir, "gen1")
    Tables.registerAll(spark, dir)
    assert(viewTag() == "gen1")
    // repeated call (the memoized fast path) still serves the live view
    Tables.registerAll(spark, dir)
    assert(viewTag() == "gen1")
    // overwrite the table IN PLACE: the scan memo keys on (mtime, length),
    // so the new file must invalidate both the plan and the registration
    Thread.sleep(5) // ensure a distinct mtime even on coarse filesystems
    writeFixture(dir, "gen2")
    Tables.registerAll(spark, dir)
    assert(viewTag() == "gen2",
      "overwritten table must re-register, not serve the stale view")
  }

  test("switching sf dirs re-registers the views") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_regmemo_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_regmemo_b").toString
    writeFixture(dirA, "dirA")
    writeFixture(dirB, "dirB")
    Tables.registerAll(spark, dirA)
    assert(viewTag() == "dirA")
    Tables.registerAll(spark, dirB)
    assert(viewTag() == "dirB")
    Tables.registerAll(spark, dirA)
    assert(viewTag() == "dirA")
  }
}
