package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipelines.{AtomicStore, BucketedFoldStore}

/** Measures the round-14 verdict #1 claim: a [[BucketedFoldStore]] fold
  * is O(delta) while the whole-table [[AtomicStore.foldOnce]] swap is
  * O(state) — fold time vs STORE SIZE at a FIXED delta, across a
  * state-size decade sweep.
  *
  * Fixture is the nightly-rollup shape: state keyed (day, id), folds
  * arrive one day at a time, the store is bucketed on `day` (the
  * delta's natural clustering dimension) with bucket size held constant
  * across decades (numBuckets grows with state, the way a real
  * deployment sizes buckets to a few HDFS blocks). Each decade seeds a
  * store of N days × idsPerDay rows, then times min-of-3 single-day
  * folds into (a) the bucketed store and (b) the whole-table foldOnce
  * store. Output: one JSON line per decade on stdout.
  *
  * Usage: sbt "runMain graft.FoldDecadeMain [idsPerDay]"
  */
object FoldDecadeMain {

  def main(args: Array[String]): Unit = {
    val idsPerDay = if (args.nonEmpty) args(0).toInt else 2500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-fold-decade")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"

    def mergeSum(state: DataFrame, d: DataFrame): DataFrame =
      state.unionByName(d).groupBy("day", "id").agg(sum("n").as("n"))

    def dayRows(day: Int): DataFrame =
      spark.range(idsPerDay.toLong)
        .select(lit(day).as("day"), col("id").cast("long").as("id"),
          lit(1L).as("n"))

    def seedRows(days: Int): DataFrame =
      spark.range(days.toLong * idsPerDay).select(
        (col("id") / idsPerDay).cast("int").as("day"),
        pmod(col("id"), lit(idsPerDay)).cast("long").as("id"),
        lit(1L).as("n"))

    def rm(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      ()
    }

    def timeMinOf3(body: Int => Unit): Double =
      (1 to 3).map { i =>
        val t0 = System.nanoTime()
        body(i)
        (System.nanoTime() - t0) / 1e9
      }.min

    // decade sweep: 40 → 400 → 4000 days (state 1e5 → 1e6 → 1e7 rows at
    // the default idsPerDay); bucket size pinned at 4 days of rows
    Seq(40, 400, 4000).foreach { days =>
      val stateRows = days.toLong * idsPerDay
      val bRoot = s"$scratch/graft_fold_decade_b_$days"
      val wRoot = s"$scratch/graft_fold_decade_w_$days"
      Seq(bRoot, wRoot, wRoot + ".staging", wRoot + ".old", wRoot + ".lock")
        .foreach(rm)
      val buckets = math.max(1, days / 4)
      BucketedFoldStore.foldOnce(spark, bRoot, "seed", seedRows(days),
        Seq("day"), buckets)(mergeSum)
      AtomicStore.foldOnce(spark, wRoot, "seed", seedRows(days))(mergeSum)
      // fold the SAME single day repeatedly under fresh batch ids: the
      // delta is fixed, only the store size varies across decades
      val day = days - 1
      val bSec = timeMinOf3 { i =>
        BucketedFoldStore.foldOnce(spark, bRoot, s"mb_$i", dayRows(day),
          Seq("day"), buckets)(mergeSum)
      }
      val wSec = timeMinOf3 { i =>
        AtomicStore.foldOnce(spark, wRoot, s"mb_$i", dayRows(day))(mergeSum)
      }
      println(s"""{"state_rows":$stateRows,"days":$days,"num_buckets":$buckets,""" +
        s""""delta_rows":$idsPerDay,"bucketed_fold_s":$bSec,""" +
        s""""whole_table_fold_s":$wSec}""")
      System.out.flush()
      Seq(bRoot, wRoot, wRoot + ".staging", wRoot + ".old", wRoot + ".lock")
        .foreach(rm)
    }
    spark.stop()
  }
}
