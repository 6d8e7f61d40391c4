package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipelines.AtomicStore

/** Child-JVM entry point for [[AtomicStoreCrossProcessSpec]]: a real
  * second process doing a real lease-locked read-merge-write, because
  * the lock's whole point is CROSS-JVM arbitration and the in-JVM
  * `AtomicStoreSpec` races only threads (round-10 verdict #6). Lives in
  * test sources — the spec spawns it with `java -cp` on the forked test
  * classpath.
  *
  * Modes:
  *   - `upsert <store> <value> <holdMs>`: acquire `{store}.lock`, drop a
  *     `{store}.held_<value>` marker (the parent's "contention is now
  *     real" signal), sleep `holdMs` while holding, then merge `<value>`
  *     into the store and release. Prints `CONTENDER_DONE <value>`.
  *   - `crash <store> <value> <holdMs>`: acquire the lock, drop the
  *     marker, then `Runtime.halt` — a genuine process death that skips
  *     every finally/shutdown hook, leaving the lock file orphaned
  *     exactly as a crashed writer would.
  */
object LockContenderMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, store, value, holdMs) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"lock-contender-$value")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def markHeld(): Unit =
      Files.writeString(Paths.get(s"$store.held_$value"), s"pid=${ProcessHandle.current().pid()}\n")

    mode match {
      case "upsert" =>
        AtomicStore.withLock(spark, store) {
          markHeld()
          val base =
            try spark.read.parquet(store).as[Int].collect().toSeq
            catch { case _: Throwable => Seq.empty[Int] }
          Thread.sleep(holdMs.toLong)
          AtomicStore.overwrite((base :+ value.toInt).toDF("v"), store)
        }
        println(s"CONTENDER_DONE $value")
        spark.stop()
      case "crash" =>
        AtomicStore.withLock(spark, store) {
          markHeld()
          // skip every finally (incl. withLock's release) — process death
          Runtime.getRuntime.halt(42)
        }
      case other =>
        sys.error(s"unknown mode $other")
    }
  }
}
