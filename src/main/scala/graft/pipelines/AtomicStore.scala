package graft.pipelines

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Crash-safe overwrite for plain-parquet store tables.
  *
  * Plain parquet has no transaction log, and `mode(Overwrite)` on the
  * live path is delete-then-write: a crash mid-write loses the WHOLE
  * table (round-2 review finding on the upsert sinks). This helper
  * restores the classic durability shape a MERGE-capable table format
  * would give for free:
  *
  *   1. write the new contents to `{path}.staging` (durable storage,
  *      NOT a localCheckpoint — executor loss cannot lose the data);
  *   2. rename live → `{path}.old`, staging → live (two metadata-only
  *      renames, no data copy);
  *   3. drop `{path}.old`.
  *
  * Failure at any step leaves a complete copy of the table on disk:
  * before step 2 the live path is untouched; between the renames the
  * finished staging copy exists; [[recover]] rolls the store forward
  * (prefer staging — it is the completed newer merge) and is idempotent,
  * so a restarted job just calls it before reading.
  */
object AtomicStore {

  /** Atomically replace the table at `path` with `df`. Optional
    * `partitionByCols` preserves a partitioned layout through the swap.
    *
    * CONCURRENCY CONTRACT (round-8 verdict #5): one writer at a time.
    * The swap itself cannot merge two concurrent upserts — without a
    * transaction log the later rename would silently discard the
    * earlier writer's rows. So `overwrite` takes a `{path}.lock` file
    * via create-if-absent before staging and releases it after the
    * swap: a second concurrent writer FAILS LOUDLY instead of
    * last-write-winning. `fs.create(…, overwrite = false)` is atomic
    * on HDFS-semantics filesystems (local FS included); an
    * object-store deployment wanting multi-writer MERGE needs a real
    * transaction-log table format — this helper's scope is the
    * reference's single daily job, now with the single-writer
    * assumption enforced rather than implied. A writer that crashes
    * mid-swap leaves its lock behind; [[recover]] (documented as
    * "call when no writer can be live") clears it.
    */
  def overwrite(df: DataFrame, path: String,
                partitionByCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = stagingOf(target)
    val old = oldOf(target)
    val lock = lockOf(target)
    val acquired =
      try {
        if (target.getParent != null) fs.mkdirs(target.getParent)
        val out = fs.create(lock, false)
        out.write(s"pid=${ProcessHandle.current().pid()}\n".getBytes("UTF-8"))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!acquired)
      throw new java.io.IOException(
        s"AtomicStore: $target is being written by a concurrent writer " +
          s"(lock file $lock exists). If the holder crashed, run " +
          "AtomicStore.recover() when no writer is live to clear it.")
    try {
      val w = df.write.mode(SaveMode.Overwrite)
      (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
        .parquet(staging.toString)
      // ensure the completion marker recover() keys on, even if the
      // committer was configured not to stamp one
      val marker = new Path(staging, "_SUCCESS")
      if (!fs.exists(marker)) fs.create(marker).close()
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(target) && !fs.rename(target, old))
        throw new java.io.IOException(s"AtomicStore: could not retire $target")
      if (!fs.rename(staging, target))
        throw new java.io.IOException(s"AtomicStore: could not promote $staging")
      fs.delete(old, true)
    } finally fs.delete(lock, false)
  }

  /** Roll an interrupted swap forward. Idempotent; call before reading a
    * store that an unclean shutdown may have left mid-swap. Returns true
    * when something was repaired. Also clears a crashed writer's stale
    * lock file — which is why the caller must ensure no writer is LIVE
    * when recovering (the same single-operator assumption the
    * reference's daily job makes).
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = stagingOf(target)
    val old = oldOf(target)
    fs.delete(lockOf(target), false)
    // a staging dir is only trustworthy once Spark's committer stamped it
    // (_SUCCESS): a crash MID-staging-write leaves a partial dir that must
    // never be promoted (round-3 review: first-ever write, no target yet)
    def stagingComplete = fs.exists(new Path(staging, "_SUCCESS"))
    if (!fs.exists(target) && fs.exists(staging) && stagingComplete) {
      // crashed between the renames: the staging copy is the completed merge
      if (!fs.rename(staging, target))
        throw new java.io.IOException(s"AtomicStore: recovery rename failed for $staging")
      fs.delete(old, true)
      true
    } else if (!fs.exists(target) && fs.exists(staging) && fs.exists(old)) {
      // incomplete staging + retired previous generation: roll BACK
      fs.delete(staging, true)
      if (!fs.rename(old, target))
        throw new java.io.IOException(s"AtomicStore: recovery rename failed for $old")
      true
    } else if (!fs.exists(target) && fs.exists(old)) {
      // crashed after retiring live but staging also gone (partial write
      // cleaned up): fall back to the previous generation
      if (!fs.rename(old, target))
        throw new java.io.IOException(s"AtomicStore: recovery rename failed for $old")
      true
    } else {
      // normal state (or mid-staging crash: live copy still intact) —
      // just clear leftovers
      val hadLeftovers = fs.exists(staging) || fs.exists(old)
      if (fs.exists(target)) { fs.delete(staging, true); fs.delete(old, true) }
      fs.exists(target) && hadLeftovers
    }
  }

  private def stagingOf(p: Path) = new Path(p.getParent, p.getName + ".staging")
  private def oldOf(p: Path) = new Path(p.getParent, p.getName + ".old")
  private def lockOf(p: Path) = new Path(p.getParent, p.getName + ".lock")
}
