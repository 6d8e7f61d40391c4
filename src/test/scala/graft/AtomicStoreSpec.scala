package graft

import graft.pipelines.AtomicStore
import org.apache.spark.sql.functions._

/** Crash-safety contract of the staging+rename store swap (round-2
  * review: live-path overwrite is delete-then-write — a crash mid-write
  * loses the whole table).
  */
class AtomicStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_atomic_").toString + "/store"

  test("overwrite replaces contents and leaves no staging/old leftovers") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1, 2, 3).toDF("v"), path)
    AtomicStore.overwrite(Seq(4, 5).toDF("v"), path)
    val vs = spark.read.parquet(path).as[Int].collect().sorted
    assert(vs.toSeq == Seq(4, 5))
    assert(!new java.io.File(path + ".staging").exists())
    assert(!new java.io.File(path + ".old").exists())
  }

  test("recover rolls forward a crash between the two renames (staging wins)") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1).toDF("v"), path)
    // simulate: new generation fully staged, live already retired, then crash
    Seq(2).toDF("v").write.parquet(path + ".staging")
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    assert(AtomicStore.recover(spark, path))
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(2))
    assert(!new java.io.File(path + ".old").exists())
    // idempotent: a second recover is a no-op
    assert(!AtomicStore.recover(spark, path))
  }

  test("recover refuses a PARTIAL staging dir (no _SUCCESS) and rolls back to .old") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1).toDF("v"), path)
    // simulate: live retired, staging half-written (no _SUCCESS marker)
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    new java.io.File(path + ".staging").mkdirs()
    new java.io.File(path + ".staging/part-00000.parquet").createNewFile()
    assert(AtomicStore.recover(spark, path))
    // previous generation restored, garbage staging removed
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(1))
    assert(!new java.io.File(path + ".staging").exists())
  }

  test("recover leaves a first-ever partial staging alone (nothing to promote)") {
    val path = tmp()
    new java.io.File(path + ".staging").mkdirs()
    new java.io.File(path + ".staging/part-00000.parquet").createNewFile()
    assert(!AtomicStore.recover(spark, path))
    assert(!new java.io.File(path).exists())
    // next overwrite replaces the partial staging and completes normally
    AtomicStore.overwrite(Seq(5).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(5))
  }

  test("recover falls back to the previous generation when staging is gone") {
    val path = tmp()
    AtomicStore.overwrite(Seq(7).toDF("v"), path)
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    assert(AtomicStore.recover(spark, path))
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(7))
  }

  test("recover ignores a partial mid-staging crash (live copy intact)") {
    val path = tmp()
    AtomicStore.overwrite(Seq(9).toDF("v"), path)
    // a half-written staging dir from a crashed writer
    new java.io.File(path + ".staging").mkdirs()
    AtomicStore.recover(spark, path)
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(9))
    assert(!new java.io.File(path + ".staging").exists())
  }

  test("upsertMovies survives a rerun after an interrupted swap") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv_").toString
    val spark0 = spark
    import graft.pipelines.BoxOfficePipeline
    val v1 = Seq(("m1", "Movie One"), ("m2", "Movie Two")).toDF("movie_cd", "movie_nm")
    assert(BoxOfficePipeline.upsertMovies(spark0, root, v1) == 2)
    // simulate a crash that retired the live dir mid-swap
    val path = root + "/movie"
    Seq(("m3", "Movie Three")).toDF("movie_cd", "movie_nm")
      .write.mode("overwrite").parquet(path + ".staging")
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    // the rerun recovers (staging promoted) and then merges its fresh batch
    val v2 = Seq(("m4", "Movie Four")).toDF("movie_cd", "movie_nm")
    assert(BoxOfficePipeline.upsertMovies(spark0, root, v2) == 2)
    val cds = spark0.read.parquet(path).select("movie_cd").as[String].collect().sorted
    assert(cds.toSeq == Seq("m3", "m4"))
  }

  test("a second concurrent writer fails loudly once retries are exhausted, " +
      "store intact (round-8 verdict #5)") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1).toDF("v"), path)
    // writer A holds the lock (simulated: lock file present mid-write;
    // content-less, like a pre-lease writer's — mtime still carries the lease)
    assert(new java.io.File(path + ".lock").createNewFile())
    val e = intercept[java.io.IOException] {
      AtomicStore.overwrite(Seq(2).toDF("v"), path, lockRetries = 0)
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the failed attempt neither swapped nor clobbered writer A's lock
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(1))
    assert(new java.io.File(path + ".lock").exists())
    new java.io.File(path + ".lock").delete()
  }

  test("a crashed holder's lock is STOLEN once its lease expires (round-9 " +
      "verdict #4)") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1).toDF("v"), path)
    val lock = new java.io.File(path + ".lock")
    assert(lock.createNewFile())
    // age the lock past the (tiny) lease we'll pass — a crashed writer
    assert(lock.setLastModified(System.currentTimeMillis() - 60000))
    AtomicStore.overwrite(Seq(2).toDF("v"), path, lockRetries = 0, leaseMs = 1000)
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(2))
    // the thief released its own lock on the way out
    assert(!lock.exists())
  }

  test("stealIfExpired RE-VALIDATES after the rename: a live lock caught by a " +
      "stale expiry observation is put back untouched (round-12 advice fix)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_steal_").toString
    val lockFile = new java.io.File(dir, "t.lock")
    val lock = new org.apache.hadoop.fs.Path(lockFile.getAbsolutePath)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // LIVE lock (fresh mtime): the stealer must decline AND restore it —
    // this is exactly the interleaving where a holder released and a new
    // acquirer created between a stale expiry stat and the rename
    assert(lockFile.createNewFile())
    assert(!AtomicStore.stealIfExpired(fs, lock, leaseMs = 60000))
    assert(lockFile.exists(), "a live lock was not restored after the aside rename")
    assert(lockFile.getParentFile.listFiles().count(_.getName.startsWith("t.lock")) == 1,
      "the aside relic leaked")
    // EXPIRED lock: the corpse is removed and the steal reported
    assert(lockFile.setLastModified(System.currentTimeMillis() - 120000))
    assert(AtomicStore.stealIfExpired(fs, lock, leaseMs = 60000))
    assert(!lockFile.exists())
  }

  test("release reclaims a lock a stealer had parked aside mid-release " +
      "(round-12 verdict #4: no ownerless resurrection)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rel_").toString
    val target = dir + "/t"
    val lockFile = new java.io.File(dir, "t.lock")
    AtomicStore.withLock(spark, target) {
      // simulate a stealer's re-validation window: the LIVE lock is
      // parked aside when the owner's release begins, and put back a
      // few ms later (well inside the release's bounded retry budget)
      val aside = new java.io.File(dir, "t.lock.stolen-test")
      assert(lockFile.renameTo(aside))
      new Thread(() => {
        Thread.sleep(5); aside.renameTo(lockFile); ()
      }).start()
      ()
    }
    // the release retried past the park window, recognized its own
    // nonce in the resurrected lock, and deleted it — acquirers no
    // longer stall a full lease on an ownerless lock
    Thread.sleep(60)
    assert(!lockFile.exists(),
      "ownerless lock resurrected after release-while-parked")
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("t.lock")) == 0, "aside relic leaked")
  }

  test("release leaves a SUCCESSOR's lock untouched (nonce verify: the " +
      "old blind delete would have killed it)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rel2_").toString
    val target = dir + "/t"
    val lockFile = new java.io.File(dir, "t.lock")
    AtomicStore.withLock(spark, target) {
      // simulate an overrun lease: our lock was stolen as a corpse and
      // a successor acquired the path with its own nonce
      assert(lockFile.delete())
      java.nio.file.Files.write(lockFile.toPath,
        "pid=999 ts=0 nonce=someone-else\n".getBytes("UTF-8"))
      ()
    }
    assert(lockFile.exists(),
      "the successor's live lock was deleted by the old holder's release")
    assert(new String(java.nio.file.Files.readAllBytes(lockFile.toPath),
      "UTF-8").contains("someone-else"), "successor lock content clobbered")
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("t.lock")) == 1, "aside relic leaked")
    lockFile.delete()
  }

  test("two CONCURRENT upserts: the loser waits on the lock and BOTH " +
      "batches land (round-9 verdict #4)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_").toString
    val spark0 = spark
    import graft.pipelines.BoxOfficePipeline
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writerThread(cd: String, nm: String) = new Thread(() => {
      try {
        gate.await()
        BoxOfficePipeline.upsertMovies(spark0, root,
          Seq((cd, nm)).toDF("movie_cd", "movie_nm"))
      } catch { case t: Throwable => errs.add(t) }
    })
    val a = writerThread("mA", "Movie A")
    val b = writerThread("mB", "Movie B")
    a.start(); b.start(); gate.countDown()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"a writer failed: ${Option(errs.peek()).map(_.getMessage)}")
    // the lock spans read-merge-write: the loser merged against the
    // winner's output, so neither row was silently dropped
    val cds = spark0.read.parquet(root + "/movie")
      .select("movie_cd").as[String].collect().sorted
    assert(cds.toSeq == Seq("mA", "mB"))
    assert(!new java.io.File(root + "/movie.lock").exists())
  }

  test("recover clears a crashed writer's stale lock; next write proceeds") {
    val path = tmp()
    AtomicStore.overwrite(Seq(1).toDF("v"), path)
    assert(new java.io.File(path + ".lock").createNewFile())
    AtomicStore.recover(spark, path)
    assert(!new java.io.File(path + ".lock").exists())
    AtomicStore.overwrite(Seq(2).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(2))
    // and a clean overwrite releases its own lock
    assert(!new java.io.File(path + ".lock").exists())
  }
}
