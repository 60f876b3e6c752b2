package graft.operators

import java.util.concurrent.{ConcurrentHashMap, TimeUnit}
import java.util.concurrent.locks.ReentrantLock

/** Per-store serialization of the DELETION writers against the
  * maintenance loop — the enforcement half of the single-deletion-writer
  * contract every family documents ([[Tombstones.delete]],
  * [[NegEpochs.writeDeletion]]). Before this, the contract was prose: a
  * takedown stream ([[graft.streaming.DocStream.takedownStream]]) and a
  * family's maintenance stream run as SEPARATE StreamingQueries in the
  * same driver, and nothing stopped a tombstone/neg-epoch write from
  * racing a deletion-applying compact's stage-read→swap window — the
  * compact's whole-store swap would then destroy the just-written
  * deletion state with the bak dir, resurrecting a deletion already
  * reported applied.
  *
  * The deployment model is one Spark driver per store lineage (the same
  * single-writer assumption the epoch numbering is built on), so the
  * lock is in-process: one [[ReentrantLock]] per canonical store path,
  * FAIR (a takedown queued behind a long compact runs next, not
  * starved). Waiters block up to `waitMs` and then fail LOUDLY — a
  * wedged lock is an operational bug, not something to race past.
  * Cross-process misuse (two drivers writing one store) is outside the
  * lock's reach; [[NegEpochs.applyWithSwap]] carries a staged-snapshot
  * re-check as the loud backstop for exactly that.
  */
private[operators] object StoreLock {

  private val locks = new ConcurrentHashMap[String, ReentrantLock]()

  private def lockFor(storeDir: String): ReentrantLock =
    locks.computeIfAbsent(
      new org.apache.hadoop.fs.Path(storeDir).toString,
      _ => new ReentrantLock(true))

  /** Run `body` holding `storeDir`'s deletion-writer lock. Reentrant
    * (a compact's stage callback may call back into locked helpers).
    * Throws after `waitMs` of waiting — never silently skips. */
  def withLock[T](storeDir: String, who: String,
      waitMs: Long = TimeUnit.MINUTES.toMillis(10))(body: => T): T = {
    val l = lockFor(storeDir)
    if (!l.tryLock(waitMs, TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"$who: deletion-writer lock on $storeDir still held after " +
          s"${waitMs}ms — a maintenance compact or takedown is wedged; " +
          "refusing to race it")
    try body finally l.unlock()
  }

  /** Lock is currently held by another thread (spec hook). */
  private[operators] def isHeld(storeDir: String): Boolean = {
    val l = lockFor(storeDir)
    l.isLocked && !l.isHeldByCurrentThread
  }

  /** Threads are queued waiting on the lock (spec hook — lets a race
    * spec observe a writer deterministically blocked, no sleeps). */
  private[operators] def hasWaiters(storeDir: String): Boolean =
    lockFor(storeDir).hasQueuedThreads
}
