package graft

import java.nio.file.{Files, Paths}

import scala.concurrent.duration._

import graft.pipelines.AtomicStore

/** CROSS-PROCESS lease-lock proof (round-10 verdict #6): the existing
  * `AtomicStoreSpec` races threads inside one JVM, but the lock's whole
  * job is arbitrating between JVMs — the NIO `createFile` =
  * O_CREAT|O_EXCL claim is only meaningful when a SECOND process is on
  * the other side of it. These tests spawn a real `java` child on the
  * forked test classpath ([[LockContenderMain]]) and prove:
  *   1. two processes' concurrent read-merge-write upserts both land
  *      (the later one WAITS on the other's lock file, no lost update);
  *   2. a lock orphaned by a genuinely dead process (`Runtime.halt`, no
  *      finally ran) is stolen once the lease expires, and the store
  *      stays writable.
  */
class AtomicStoreCrossProcessSpec extends SparkSpec {
  import spark.implicits._

  // the same JDK-17 module opens build.sbt gives every forked JVM —
  // the child builds its own SparkSession outside spark-submit
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(mode: String, store: String, value: Int,
                    holdMs: Long): Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(java, "-Xmx2g", "-XX:+UseG1GC") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.LockContenderMain", mode, store, value.toString, holdMs.toString)
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .start()
  }

  private def awaitFile(path: String, timeout: FiniteDuration): Unit = {
    val deadline = System.nanoTime() + timeout.toNanos
    while (!Files.exists(Paths.get(path))) {
      assert(System.nanoTime() < deadline, s"timed out waiting for $path")
      Thread.sleep(100)
    }
  }

  private def tmp(): String =
    Files.createTempDirectory("graft_xproc_").toString + "/store"

  test("concurrent upserts from TWO JVMs: the second waits on the first's " +
      "lock file and both rows land (no lost update)") {
    val store = tmp()
    // child acquires first (parent waits for its held-marker), then
    // holds the lock ~3 s across its read-merge-write
    val child = spawn("upsert", store, value = 1, holdMs = 3000)
    awaitFile(s"$store.held_1", 90.seconds)
    assert(Files.exists(Paths.get(s"$store.lock")),
      "child's held-marker present but no lock file — contention not real")
    // parent's upsert must BLOCK until the child releases, then merge
    // onto the child's row rather than the empty base it would have
    // read in a lost-update race
    AtomicStore.withLock(spark, store) {
      val base =
        try spark.read.parquet(store).as[Int].collect().toSeq
        catch { case _: Throwable => Seq.empty[Int] }
      AtomicStore.overwrite((base :+ 2).toDF("v"), store)
    }
    assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
      child.exitValue() == 0, "child contender did not exit cleanly")
    val rows = spark.read.parquet(store).as[Int].collect().toSeq.sorted
    assert(rows == Seq(1, 2), s"expected both processes' rows, got $rows")
    assert(!Files.exists(Paths.get(s"$store.lock")), "lock not released")
  }

  test("a lock orphaned by a DEAD process (halt, no release) is stolen " +
      "after lease expiry; the store stays writable") {
    val store = tmp()
    val child = spawn("crash", store, value = 9, holdMs = 0)
    awaitFile(s"$store.held_9", 90.seconds)
    assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
      child.exitValue() == 42, "crash-mode child should halt(42)")
    assert(Files.exists(Paths.get(s"$store.lock")),
      "halt must leave the lock file orphaned")
    // age the orphan past the (shortened) lease instead of sleeping it out
    val lock = Paths.get(s"$store.lock")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10_000))
    AtomicStore.withLock(spark, store, leaseMs = 2000) {
      AtomicStore.overwrite(Seq(7).toDF("v"), store)
    }
    assert(spark.read.parquet(store).as[Int].collect().toSeq == Seq(7))
    assert(!Files.exists(lock), "stolen lock must be released after use")
  }
}
