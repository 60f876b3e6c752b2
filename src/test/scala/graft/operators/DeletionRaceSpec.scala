package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The single-deletion-writer contract, ENFORCED ([[StoreLock]]): a
  * takedown racing a deletion-applying compact is serialized or refused
  * loudly — never a lost deletion. Plus the cross-process backstop in
  * [[NegEpochs.applyWithSwap]]: a dels epoch appearing between the
  * stage-read and the live→bak rename aborts the swap with the staged
  * dir discarded and every deletion still pending. */
class DeletionRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val corpus = Seq(
    (1L, "a b c a b", "en", "s0"),
    (2L, "a b a b", "en", "s0"),
    (3L, "x y z", "en", "s1")).toDF("doc_id", "text", "lang", "source")

  private def lmScores(d: String) = {
    val probe = Seq((10L, "a b a"), (11L, "x y")).toDF("doc_id", "text")
    LmIndex.scoreDocs(spark, probe, d).collect().map(_.toSeq).toSet
  }

  test("a takedown arriving during an in-flight compact waits for the " +
      "lock and lands afterwards — never destroyed by the swap") {
    val base = tmp("graft-delrace")
    val idx = s"$base/lm"
    LmIndex.buildModel(spark, corpus, idx)
    // make a deletion pending so compact takes the whole-store-swap path
    LmIndex.deleteFromModel(spark, idx, corpus.filter(col("doc_id") === 3L))

    // the in-flight "compact": this thread holds the store's writer lock
    // exactly as applyWithSwap does across its stage→swap window; the
    // sweep runs on another thread and must deterministically QUEUE on
    // the lock (observed, not slept-for), then land after release
    val done = new java.util.concurrent.atomic.AtomicReference[
      Seq[Takedown.StoreResult]](null)
    val sweeper = new Thread(() =>
      done.set(Takedown.sweep(spark, corpus.filter(col("doc_id") === 2L),
        Seq(idx))))
    StoreLock.withLock(spark, idx, "spec-compact") {
      sweeper.start()
      val t0 = System.nanoTime()
      while (!StoreLock.hasWaiters(spark, idx) &&
        (System.nanoTime() - t0) < 30e9.toLong) Thread.sleep(10)
      assert(StoreLock.hasWaiters(spark, idx),
        "the sweep's deletion write must queue on the in-flight lock")
      assert(done.get === null, "the sweep must not complete while the lock is held")
    }
    sweeper.join(60000)
    assert(done.get != null)
    assert(done.get.head.action === "deleted")
    // both deletions survive the real compact that follows
    LmIndex.compact(spark, idx)
    val rebuilt = s"$base/rebuilt"
    LmIndex.buildModel(spark, corpus.filter(col("doc_id") === 1L), rebuilt)
    assert(lmScores(idx) === lmScores(rebuilt))
    assert(!new java.io.File(s"$idx/dels.parquet").exists())
  }

  test("a waiter that outlasts the lock timeout fails loudly, never races") {
    val base = tmp("graft-delto")
    val idx = s"$base/lm"
    LmIndex.buildModel(spark, corpus, idx)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      StoreLock.withLock(spark, idx, "spec-wedge") { release.await() })
    holder.start()
    val t0 = System.nanoTime()
    while (!StoreLock.isHeld(spark, idx) &&
      (System.nanoTime() - t0) < 5e9.toLong) Thread.sleep(10)
    try {
      val ex = intercept[IllegalStateException] {
        StoreLock.withLock(spark, idx, "spec-waiter", waitMs = 300) { fail("must not run") }
      }
      assert(ex.getMessage.contains("refusing to race"))
    } finally { release.countDown(); holder.join() }
  }

  test("applyWithSwap backstop: a dels epoch written mid-stage by a writer " +
      "the lock cannot see aborts the swap; deletions stay pending and " +
      "correct, and the next compact applies them all") {
    val base = tmp("graft-delbackstop")
    val idx = s"$base/lm"
    LmIndex.buildModel(spark, corpus, idx)
    LmIndex.deleteFromModel(spark, idx, corpus.filter(col("doc_id") === 3L))

    // a writer the lock cannot exclude (stands in for a second driver):
    // a complete deletion landing while the apply is staging — reentrant
    // on this thread, so it bypasses the lock exactly like another process
    val ex = intercept[IllegalStateException] {
      NegEpochs.applyWithSwap(spark, idx) { stagedTmp =>
        // the apply's own staged table (content irrelevant — the swap
        // must be aborted before it goes live)
        corpus.limit(1).write.parquet(s"$stagedTmp/docs.parquet/epoch=0")
        LmIndex.deleteFromModel(spark, idx, corpus.filter(col("doc_id") === 2L))
      }
    }
    assert(ex.getMessage.contains("raced a concurrent deletion write"))
    // live store untouched by the aborted swap: BOTH deletions pending
    // and already correct on the read path, staged dir discarded
    val rebuilt = s"$base/rebuilt"
    LmIndex.buildModel(spark, corpus.filter(col("doc_id") === 1L), rebuilt)
    assert(lmScores(idx) === lmScores(rebuilt))
    assert(!new java.io.File(s"$idx.apply-tmp").exists())
    assert(new java.io.File(s"$idx/dels.parquet").exists())
    // the next compact applies both — nothing was lost
    LmIndex.compact(spark, idx)
    assert(lmScores(idx) === lmScores(rebuilt))
    assert(!new java.io.File(s"$idx/dels.parquet").exists())
  }
}
