package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The pseudo-label append's ensure-writer shape: the batch's resident
  * pre-check runs OUTSIDE the lock (cheap memo), but the authoritative
  * anti-join re-runs INSIDE the hold — a rival writer landing rows for
  * the same vec_ids between the two must not be double-published.
  * Deterministic via the lock's wait queue (the AuditLogRaceSpec
  * technique, no sleeps-as-logic). */
class PseudoLabelRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rows landed by a rival writer during the serve window are " +
      "re-checked away inside the hold") {
    val out = java.nio.file.Files.createTempDirectory("graft-pseudo-race").toString
    val emb = graft.Tables.table(spark, dir, "embeddings")
    def batchOf(ids: Seq[Long]) = emb.filter(col("vec_id").isin(ids: _*))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))

    // epoch 0 exists so the store dir and table are live
    graft.streaming.DocStream.processPseudoLabelBatch(
      spark, dir, out, batchOf(Seq(1L)))

    // rival holds the writer lock; the victim thread's pre-check and
    // serve run against the pre-rival store, then it queues on the lock
    val rivalHolds = new java.util.concurrent.CountDownLatch(1)
    val victimQueued = new java.util.concurrent.CountDownLatch(1)
    val rival = new Thread(() =>
      StoreLock.withLock(spark, out, "rival-writer") {
        rivalHolds.countDown()
        // wait (bounded) for the victim to be deterministically queued
        victimQueued.await(60, java.util.concurrent.TimeUnit.SECONDS)
        // land the rival's rows for id 1000002 as the next epoch
        Seq((1000002L, 7)).toDF("vec_id", "pred_label")
          .write.parquet(s"$out/${PseudoLabelStore.Table}/epoch=1")
      })
    rival.start()
    rivalHolds.await(60, java.util.concurrent.TimeUnit.SECONDS)

    val victim = new Thread(() =>
      graft.streaming.DocStream.processPseudoLabelBatch(
        spark, dir, out, batchOf(Seq(2L, 3L))))
    victim.start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!StoreLock.hasWaiters(spark, out) && System.nanoTime() < deadline)
      Thread.`yield`()
    assert(StoreLock.hasWaiters(spark, out),
      "the victim must be observed queued on the writer lock")
    victimQueued.countDown()
    rival.join(120000); victim.join(120000)

    val rows = spark.read.parquet(s"$out/${PseudoLabelStore.Table}")
    assert(rows.filter(col("vec_id") === 1000002L).count() === 1,
      "the rival's row must not be double-published by the victim")
    assert(rows.filter(col("vec_id") === 1000002L).head.getInt(1) === 7,
      "the surviving row is the rival's, not the victim's recomputation")
    assert(rows.filter(col("vec_id") === 1000003L).count() === 1,
      "the victim's non-overlapping id still lands")
    assert(rows.select(col("vec_id")).distinct().count() === rows.count())
  }
}
