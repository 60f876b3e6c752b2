package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The audit ledger's epoch numbering is read-modify-write (max+1), so
  * concurrent compliance writers to ONE logDir must serialize on the
  * same [[StoreLock]] mechanism as the store writers — before this, two
  * drivers (or two threads) logging one sweep each could scan the same
  * max and the second publish would silently REPLACE the first attempt's
  * history. Observed deterministically via the lock's wait queue (the
  * [[DeletionRaceSpec]] pattern — no sleeps). */
class AuditLogRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a second sweepLogged queues on the ledger lock and appends — " +
      "never collides an epoch, both attempts in history") {
    val base = java.nio.file.Files.createTempDirectory("graft-auditrace").toString
    val idx = s"$base/search"
    val logDir = s"$base/audit"
    val corpus = Seq(
      (1L, "alpha beta", "en", "s0"),
      (2L, "gamma delta", "de", "s0")).toDF("doc_id", "text", "lang", "source")
    SearchIndex.buildIndex(spark, corpus, idx)

    // writer B arrives while THIS thread holds the ledger lock exactly
    // as writer A's log write does; B must deterministically QUEUE, then
    // land as the NEXT epoch after release
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerB = new Thread(() => {
      Takedown.sweepLogged(spark, "req-B",
        corpus.filter(col("doc_id") === 2L), Seq(idx), logDir)
      done.set(true)
    })
    StoreLock.withLock(spark, logDir, "spec-writer-A-log") {
      writerB.start()
      val t0 = System.nanoTime()
      while (!StoreLock.hasWaiters(spark, logDir) &&
        (System.nanoTime() - t0) < 30e9.toLong) Thread.sleep(10)
      assert(StoreLock.hasWaiters(spark, logDir),
        "the concurrent compliance writer must queue on the ledger lock")
      assert(!done.get, "writer B must not log while the lock is held")
      // writer A's own attempt, under the lock it already holds (the
      // real log() path re-enters reentrantly just like this)
      Takedown.sweepLogged(spark, "req-A",
        corpus.filter(col("doc_id") === 1L), Seq(idx), logDir)
    }
    writerB.join(60000)
    assert(done.get)

    val log = Takedown.sweepLog(spark, logDir)
      .select("attempt", "request_id").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(log === Set(0 -> "req-A", 1 -> "req-B"),
      "attempts must serialize to distinct consecutive epochs")
  }
}
