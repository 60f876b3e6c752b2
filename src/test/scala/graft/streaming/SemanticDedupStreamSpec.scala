package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The streaming SemDeDup-at-ingest lane: arriving vectors compare
  * against ONLY their clusters' resident survivors in the persisted IVF
  * store; kept vectors fold in, dropped ones don't; decisions are
  * eager (as-of arrival) and replay-stable. */
class SemanticDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Tau = 0.95
  private val cents: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(1.0, 0.0, 0.0, 0.0),
    1L -> Seq(0.0, 1.0, 0.0, 0.0))

  private val a = (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f))      // resident, == c0
  private val b = (11L, Seq(0.9f, 0.1f, 0.0f, 0.0f))      // near-dup of a → dropped
  private val c = (12L, Seq(0.1f, 0.0f, 1.0f, 0.0f))      // isolated → kept
  private val d = (13L, Seq(0.0f, 0.0f, 0.95f, 0.05f))    // near-dup of c, worse rank → dropped
  private val e = (14L, Seq(0.09f, 0.0f, 0.99f, 0.0f))    // near-dup of c, BETTER rank → kept (eager)

  private def vdf(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("ingest-order semantic dedup: drops near-dups of survivors, keeps the rest") {
    val base = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    val indexDir = s"$base/idx"
    val decisionsDir = s"$base/decisions"
    graft.operators.IvfIndex.buildIndex(spark, indexDir, cents, vdf(a))

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Float])]
    val q = EmbedStream.semanticDedupStream(
      spark, input.toDF().toDF("vec_id", "embedding"), indexDir, decisionsDir, Tau)
    try {
      input.addData(b, c)
      q.processAllAvailable()
      input.addData(d, e, b) // b re-delivered: re-decided identically
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(decisionsDir)
      .select(col("vec_id"), col("kept")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toList
    // exactly one DISTINCT decision per vector (replays re-decide equal)
    assert(decisions.map(_._1).distinct.size === decisions.size,
      s"conflicting decisions: $decisions")
    val dm = decisions.toMap
    assert(dm === Map(11L -> 0L, 12L -> 1L, 13L -> 0L, 14L -> 1L), dm.toString)

    // the store holds exactly the survivors (a from the build, c and e)
    val stored = spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(stored === Set(10L, 12L, 14L))

    // replaying an already-kept vector adds no epoch and no decision row
    def epochs = new java.io.File(s"$indexDir/cells.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val beforeEpochs = epochs
    val beforeDecisions = spark.read.parquet(decisionsDir).count()
    EmbedStream.processSemanticDedupBatch(
      spark, indexDir, decisionsDir, Tau, vdf(c))
    assert(epochs === beforeEpochs)
    assert(spark.read.parquet(decisionsDir).count() === beforeDecisions)
  }

  private def storedIds(indexDir: String): Set[Long] =
    spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  test("reconcile evicts order-admitted dominated survivors to the batch keep-rule") {
    val base = java.nio.file.Files.createTempDirectory("graft-semrec").toString
    val indexDir = s"$base/idx"
    val decisionsDir = s"$base/decisions"
    graft.operators.IvfIndex.buildIndex(spark, indexDir, cents, vdf(a))
    // eager drift by construction: c (12) is admitted in batch 1, then e
    // (14) — a τ-neighbor of c with BETTER (d2c, id) rank — is admitted
    // in batch 2; the eager lane cannot retro-drop c, so the store holds
    // a vector the batch rule over the full arrival union {a,b,c,d,e}
    // would drop (that rule keeps exactly {a, e}: b is a τ-dup of a, d
    // of c, and c is dominated by e — all same-cluster, ranked by d2c)
    EmbedStream.processSemanticDedupBatch(spark, indexDir, decisionsDir, Tau, vdf(b, c))
    EmbedStream.processSemanticDedupBatch(spark, indexDir, decisionsDir, Tau, vdf(d, e))
    assert(storedIds(indexDir) === Set(10L, 12L, 14L), "eager state before reconcile")

    val n = EmbedStream.reconcileSemanticDedup(spark, indexDir, Tau, Some(decisionsDir))
    assert(n === 1L)
    assert(storedIds(indexDir) === Set(10L, 14L),
      "store must equal the batch keep-rule's survivor set")
    // the eviction is audited, and the rewrite folded the epochs to one
    val audit = spark.read.parquet(s"$indexDir/reconcile_audit.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(audit === Set(12L))
    // the ledger got a superseding kept=0 row: effective keep (min(kept)
    // per vec_id) now matches the store without joining the audit table
    val effective = spark.read.parquet(decisionsDir)
      .groupBy(col("vec_id")).agg(min(col("kept")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(effective === Map(11L -> 0L, 12L -> 0L, 13L -> 0L, 14L -> 1L), effective.toString)
    // a post-eviction redelivery of the evicted id re-decides kept=0
    // (its dominator is resident), never contradicting the superseding row
    EmbedStream.processSemanticDedupBatch(spark, indexDir, decisionsDir, Tau, vdf(c))
    val cRows = spark.read.parquet(decisionsDir)
      .filter(col("vec_id") === 12L).select(col("kept")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cRows === Set(0L, 1L) || cRows === Set(0L), cRows.toString)
    assert(storedIds(indexDir) === Set(10L, 14L), "redelivered evicted id stays out")
    val epochs = new java.io.File(s"$indexDir/cells.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    assert(epochs === 1, "reconcile rewrite is itself a compaction")
    // idempotent: a reconciled store has no violators left
    assert(EmbedStream.reconcileSemanticDedup(spark, indexDir, Tau) === 0L)
    assert(storedIds(indexDir) === Set(10L, 14L))
  }

  test("reconcileEvery policy trigger self-corrects the store unattended") {
    val base = java.nio.file.Files.createTempDirectory("graft-semrecpol").toString
    val indexDir = s"$base/idx"
    val decisionsDir = s"$base/decisions"
    graft.operators.IvfIndex.buildIndex(spark, indexDir, cents, vdf(a))
    // epoch-count trigger at 2: fires after each kept append once the
    // store has ≥ 2 epochs, and its rewrite re-arms the counter
    Seq(vdf(b, c), vdf(d, e)).foreach { batch =>
      EmbedStream.processSemanticDedupBatch(
        spark, indexDir, decisionsDir, Tau, batch, reconcileEvery = 2)
    }
    assert(storedIds(indexDir) === Set(10L, 14L),
      "the policy-triggered reconcile must have evicted the dominated survivor")
  }
}
