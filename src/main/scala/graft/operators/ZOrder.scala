package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the real form of the "poor-man's Z-order" note on
  * [[graft.pipelines.BoxOfficePipeline.clusteredWrite]].
  *
  * A single-column sort makes parquet row-group min/max stats selective
  * for ONE predicate column; every other column's range spans the whole
  * table in every file. Interleaving the bits of k columns into one sort
  * key gives every column locality ~2^(bits/k): a file covers a k-dim
  * block, so range predicates on ANY of the k columns prune files. This
  * is what table formats ship as OPTIMIZE ZORDER BY; on plain parquet the
  * same effect comes from sorting by the interleaved key at write time.
  *
  * The key is pure codegen'd arithmetic (shift/and/multiply-by-2^j — no
  * UDF, engine-portable), so it runs inside the scan projection and the
  * sort is the only exchange.
  */
object ZOrder {

  /** Bit-interleaved key: bit `b` of column `i` lands at position
    * `b * n + i` (LSB-first round-robin across columns). Columns must be
    * non-null integers in [0, 2^bits) — out-of-contract values would
    * silently alias distant points onto nearby keys, so they fail loudly
    * instead (same open-surface reasoning as ShingleHash64/DotFixedPoint).
    * Callers bucket unbounded domains first (e.g. `pmod`, date-diff,
    * quantile bucket) — bucketing IS the resolution lever: bits beyond
    * the file count's log2 add nothing.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey: at least one column")
    // bits <= 62: the range guard computes 1L << bits, which at bits=63
    // overflows to Long.MinValue — every row would then "fail" the range
    // check (with a negative bound in the message) even though the
    // interleave itself is valid
    require(bits >= 1 && bits <= 62 && cols.size * bits <= 63,
      s"zorderKey: need 1 <= bits <= 62 and n*bits <= 63, got n=${cols.size} bits=$bits")
    val n = cols.size
    val longs = cols.map(_.cast("long"))
    val key = longs.zipWithIndex.map { case (c, i) =>
      (0 until bits).map { b =>
        shiftright(c, b).bitwiseAND(lit(1L)) * lit(1L << (b * n + i))
      }.reduce(_ + _)
    }.reduce(_ + _)
    val bad = longs.map(c => c.isNull || c < 0 || c >= lit(1L << bits)).reduce(_ || _)
    when(bad, raise_error(lit(
      s"zorder_key: values must be non-null in [0, ${1L << bits}) — bucket first")))
      .otherwise(key)
  }

  /** Write `df` as `nFiles` parquet files clustered along the Z-curve of
    * `zCols` (each pre-bucketed to [0, 2^bits)): range-partition by the
    * interleaved key, sort within partitions, drop the helper. Every
    * file then covers a compact k-dim block, so min/max footer stats
    * prune on any zCol — [[ZOrderSpec]] measures the file-skip win vs a
    * single-column sort. Range boundaries come from Spark's deterministic
    * reservoir sample; at 100 TB this is the same one-pass shuffle a
    * plain global sort costs, amortized over every scan thereafter.
    */
  def zorderWrite(df: DataFrame, path: String, nFiles: Int,
                  zCols: Seq[String], bits: Int): Unit = {
    // zorderKey's cast("long") would silently TRUNCATE fractional types,
    // z-ordering on floor(x) without the caller noticing — reject here,
    // where the schema is known (the Column-based key can't check)
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    // resolve through the analyzer (honors spark.sql.caseSensitive) rather
    // than a case-sensitive StructType lookup; scale-0 decimals are exact
    // under cast("long"), so they pass
    def dtype(c: String) = df.select(col(c)).schema.head.dataType
    val nonIntegral = zCols.filterNot { c =>
      dtype(c) match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType if d.scale == 0 => true
        case _ => false
      }
    }
    require(nonIntegral.isEmpty,
      s"zorderWrite: zCols must be integral (cast/bucket first), got non-integral: " +
        nonIntegral.map(c => s"$c: ${dtype(c).simpleString}").mkString(", "))
    require(!df.columns.contains("__z"),
      "zorderWrite: input already has a __z column — rename it; the writer " +
        "uses __z as its internal sort key and would silently drop yours")
    df.withColumn("__z", zorderKey(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
