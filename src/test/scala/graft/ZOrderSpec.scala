package graft

import java.nio.file.Files

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits LSB-first round-robin across columns") {
    // x=1 (bit0) → position 0; y=2 (bit1) → position 1*2+1 = 3 → 8
    val out = Seq((1, 2), (3, 3), (0, 0), (63, 63))
      .toDF("x", "y")
      .select(ZOrder.zorderKey(Seq(col("x"), col("y")), bits = 6).as("z"))
      .as[Long].collect().toSeq
    // (3,3): x bits 0,1 → positions 0,2 (1+4); y bits 0,1 → positions 1,3
    // (2+8) = 15. (63,63): all 12 positions set = 4095.
    assert(out == Seq(1L + 8L, 15L, 0L, 4095L))
  }

  test("zorderKey fails loudly on out-of-range or null input") {
    val bad = Seq((64, 0)).toDF("x", "y")
      .select(ZOrder.zorderKey(Seq(col("x"), col("y")), bits = 6).as("z"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("zorder_key"))
    val nul = Seq((Some(1), Option.empty[Int])).toDF("x", "y")
      .select(ZOrder.zorderKey(Seq(col("x"), col("y")), bits = 6).as("z"))
    val e2 = intercept[Exception](nul.collect())
    assert(e2.getMessage.contains("zorder_key"))
  }

  test("zorderKey rejects bits=63 (1L<<63 overflow would fail every row)") {
    val e = intercept[IllegalArgumentException](
      ZOrder.zorderKey(Seq(col("x")), bits = 63))
    assert(e.getMessage.contains("bits <= 62"))
    // bits=62 single-column stays legal: guard bound 1L<<62 is positive
    ZOrder.zorderKey(Seq(col("x")), bits = 62)
  }

  test("zorderWrite rejects non-integral clustering columns (silent truncation guard)") {
    val df = Seq((1, 2.5)).toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zbad_").toString
    val e = intercept[IllegalArgumentException](
      ZOrder.zorderWrite(df, dir, nFiles = 1, zCols = Seq("x", "y"), bits = 6))
    assert(e.getMessage.contains("non-integral") && e.getMessage.contains("y"))
  }

  test("z-ordered files prune a y-range predicate that an x-sort cannot") {
    // 64×64 grid; 16 files. x-sorted layout: every file spans the full
    // y range, so a y-predicate matches ALL files. Z-ordered layout:
    // files cover compact 2-D blocks, so most files' y min/max excludes
    // the range.
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).cast("int").as("x"),
              (col("id") / 64).cast("int").as("y"))
    val zDir = Files.createTempDirectory("graft_z_").toString
    val xDir = Files.createTempDirectory("graft_x_").toString
    ZOrder.zorderWrite(grid, zDir, nFiles = 16, zCols = Seq("x", "y"), bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    def filesMatchingY(path: String, lo: Int, hi: Int): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymax") >= lo && col("ymin") <= hi)
        .count()

    val zMatch = filesMatchingY(zDir, 8, 15)
    val xMatch = filesMatchingY(xDir, 8, 15)
    assert(xMatch == 16L, s"x-sorted layout should span y everywhere, got $xMatch")
    assert(zMatch <= 8L, s"z-order should prune most files, got $zMatch")
    // both layouts hold the same rows
    assert(spark.read.parquet(zDir).count() == 4096L)
  }
}
