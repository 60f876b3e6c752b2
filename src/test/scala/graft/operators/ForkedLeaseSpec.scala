package graft.operators

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The cross-process lease exercised through a REAL process boundary
  * (r13 verdict #3): a second JVM ([[LeaseProbeMain]]) acquires, holds,
  * heartbeats, and crashes on a store while this JVM observes refusal,
  * heartbeat survival, and dead-pid takeover — the deployment the lease
  * exists for, which the in-JVM lease plants of [[StoreLeaseSpec]]
  * cannot fully reproduce (hard-link create, pid-namespace scope,
  * kernel-real dead pid). Synchronization is via the probe's marker
  * files and the lease file itself, polled with deadlines — no
  * sleeps-as-logic. */
class ForkedLeaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def leaseFile(storeDir: String) = Paths.get(storeDir + ".lease")

  /** Fork a probe JVM. The test JVM is itself forked by sbt with the
    * full dependency classpath, so `java.class.path` carries everything
    * the probe needs (hadoop-common for the local FileSystem; no Spark). */
  private def fork(storeDir: String, mode: String, syncDir: String,
      expiryMs: Long): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      java, "-cp", System.getProperty("java.class.path"),
      "graft.operators.LeaseProbeMain",
      storeDir, mode, syncDir, expiryMs.toString)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  private def await(cond: => Boolean, what: String, ms: Long = 60000): Unit = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  test("a SECOND PROCESS's live hold refuses this JVM's writers through " +
      "the real boundary, heartbeats under it, and hands over on release") {
    val base = tmp("graft-fork-hold")
    val store = s"$base/store"
    Files.createDirectories(Paths.get(store))
    val sync = tmp("graft-fork-sync")
    // short expiry so the heartbeat period (expiry/3 = 1s) is observable
    val probe = fork(store, "hold", sync, expiryMs = 3000)
    try {
      await(Files.exists(Paths.get(sync, "acquired")), "probe acquire")
      val owner = Files.readString(leaseFile(store)).linesIterator.next()
      val probePid = Files.readString(Paths.get(sync, "acquired")).trim
      assert(owner.startsWith(s"$probePid@"),
        s"the on-disk lease must carry the probe's pid: $owner")
      // refusal through the boundary — a FRESH foreign (live) lease
      val e = intercept[StoreLock.LeaseHeldException] {
        StoreLock.withLock(spark, store, "spec-second-driver") {
          fail("must not acquire over a live foreign process")
        }
      }
      assert(e.getMessage.contains(probePid + "@"),
        s"refusal must name the live owner: ${e.getMessage}")
      // heartbeat survival: the probe's beat (every 1s) refreshes the
      // lease mtime while it holds — observe at least one refresh
      val m0 = Files.getLastModifiedTime(leaseFile(store)).toMillis
      await(Files.getLastModifiedTime(leaseFile(store)).toMillis > m0,
        "a heartbeat refresh from the probe process", ms = 10000)
      // release: the probe exits cleanly and deletes its lease...
      Files.write(Paths.get(sync, "release"), Array.emptyByteArray)
      assert(probe.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(probe.exitValue() === 0)
      await(!Files.exists(leaseFile(store)), "probe lease release")
      // ...and this JVM acquires normally
      var ran = false
      StoreLock.withLock(spark, store, "spec-after-release") { ran = true }
      assert(ran)
    } finally {
      if (probe.isAlive) probe.destroyForcibly()
      ()
    }
  }

  test("a CRASHED second process (kernel-real dead pid, fresh lease " +
      "mtime) is taken over immediately through the pid-namespace check") {
    val base = tmp("graft-fork-crash")
    val store = s"$base/store"
    Files.createDirectories(Paths.get(store))
    val sync = tmp("graft-fork-sync2")
    val probe = fork(store, "crash", sync, expiryMs = StoreLock.DefaultLeaseExpiryMs)
    try {
      await(Files.exists(Paths.get(sync, "acquired")), "probe acquire")
      assert(probe.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(probe.exitValue() === 42, "the probe must have halted mid-hold")
      // the crash residue: lease still on disk, mtime FRESH (far from
      // expiry), owner a pid that is now dead in OUR pid namespace
      assert(Files.exists(leaseFile(store)),
        "a halted holder must leave its lease behind")
      val t0 = System.nanoTime()
      var ran = false
      StoreLock.withLock(spark, store, "spec-dead-pid-takeover") { ran = true }
      val tookMs = (System.nanoTime() - t0) / 1000000L
      assert(ran)
      assert(tookMs < StoreLock.DefaultLeaseExpiryMs / 10,
        s"dead-pid takeover must not wait out the 10-min expiry (${tookMs}ms)")
      assert(!Files.exists(leaseFile(store)), "takeover's own lease released")
    } finally {
      if (probe.isAlive) probe.destroyForcibly()
      ()
    }
  }
}
