package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pending deletions on stores OUTSIDE any maintenance stream must be
  * retirable without an operator-run compact: the forced-compact trigger
  * ([[IndexPolicy.maybeCompact]]'s deletion arm) only fires from
  * maintenance lanes, so a swept-but-unmaintained store kept its
  * tombstones/neg-epochs — and the measured 1.15–2.17× pending-read tax —
  * forever. Two closures: [[Takedown.sweep]]`(applyNow = true)` retires
  * in the same sweep; [[IndexFsck.repair]] retires after the fact. Both
  * run the REGISTRY row's own deletion-applying compact, so a family
  * added to [[graft.IndexCatalog.Families]] gets retirement for free. */
class TakedownApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val corpus = Seq(
    (1L, "alpha beta alpha gamma", "en", "s0"),
    (2L, "gamma delta epsilon zeta", "de", "s0"),
    (3L, "alpha beta beta delta", "en", "s1"))
    .toDF("doc_id", "text", "lang", "source")

  private def lmScores(d: String) = {
    val probe = Seq((9L, "alpha beta delta"), (10L, "gamma delta"))
      .toDF("doc_id", "text")
    LmIndex.scoreDocs(spark, probe, d).collect().map(_.toSeq).toSet
  }

  test("sweep(applyNow): both deletion disciplines retire their pending " +
      "state in the same sweep — no maintenance lane anywhere") {
    val base = tmp("graft-applynow")
    SearchIndex.buildIndex(spark, corpus, s"$base/search") // tombstone class
    LmIndex.buildModel(spark, corpus, s"$base/lm")         // count class
    val victims = corpus.filter(col("doc_id") === 2L)

    val rs = Takedown.sweep(spark, victims,
      Seq(s"$base/search", s"$base/lm"), applyNow = true)
    assert(rs.map(r => r.family -> r.action).toMap ===
      Map("search" -> "deleted_applied", "lm-bigram" -> "deleted_applied"))

    // pending state GONE — reads are back on the fast path, not the
    // anti-join / pos−neg netting
    assert(!IndexPolicy.pendingDeletes(spark, s"$base/search"))
    assert(!IndexPolicy.pendingDeletes(spark, s"$base/lm"))
    assert(!new java.io.File(s"$base/search/tombstones.parquet").exists())
    assert(!new java.io.File(s"$base/lm/dels.parquet").exists())

    // and the retirement is the REAL compact: store ≡ rebuild-minus-victim
    SearchIndex.buildIndex(spark,
      corpus.filter(col("doc_id") =!= 2L), s"$base/search-rebuilt")
    assert(
      SearchIndex.bm25FromIndex(spark, s"$base/search", Seq("alpha", "delta"), 10)
        .collect().map(_.toSeq).toSet ===
      SearchIndex.bm25FromIndex(spark, s"$base/search-rebuilt",
        Seq("alpha", "delta"), 10).collect().map(_.toSeq).toSet)
    LmIndex.buildModel(spark,
      corpus.filter(col("doc_id") =!= 2L), s"$base/lm-rebuilt")
    assert(lmScores(s"$base/lm") === lmScores(s"$base/lm-rebuilt"))

    // fsck is clean of pending_deletes findings
    assert(!IndexFsck.fsck(spark, s"$base/search")
      .exists(_.check == "pending_deletes"))
    assert(!IndexFsck.fsck(spark, s"$base/lm")
      .exists(_.check == "pending_deletes"))

    // a replayed applyNow sweep finds nothing pending: the tombstone
    // family reports plain noop (no phantom epoch, no compact)
    val replay = Takedown.sweep(spark, victims,
      Seq(s"$base/search"), applyNow = true)
    assert(replay.head.action === "noop")
  }

  test("applyNow also retires an EARLIER sweep's pending state riding a " +
      "noop replay (the id is already tombstoned, the tax still ends)") {
    val base = tmp("graft-applylate")
    SearchIndex.buildIndex(spark, corpus, s"$base/search")
    val victims = corpus.filter(col("doc_id") === 2L)
    Takedown.sweep(spark, victims, Seq(s"$base/search"))
    assert(IndexPolicy.pendingDeletes(spark, s"$base/search"))
    // replay of the same request, now with applyNow: the delete is a
    // noop (already tombstoned) but the retirement must still run
    val rs = Takedown.sweep(spark, victims, Seq(s"$base/search"),
      applyNow = true)
    assert(rs.head.action === "noop_applied")
    assert(!IndexPolicy.pendingDeletes(spark, s"$base/search"))
  }

  test("IndexFsck.repair retires pending deletions after the fact and is " +
      "a no-op on a clean store") {
    val base = tmp("graft-repair")
    LmIndex.buildModel(spark, corpus, s"$base/lm")
    val victims = corpus.filter(col("doc_id") === 3L)
    Takedown.sweep(spark, victims, Seq(s"$base/lm"))
    assert(IndexPolicy.pendingDeletes(spark, s"$base/lm"))
    assert(IndexFsck.fsck(spark, s"$base/lm").exists(_.check == "pending_deletes"))

    assert(IndexFsck.repair(spark, s"$base/lm") === true)
    assert(!IndexPolicy.pendingDeletes(spark, s"$base/lm"))
    assert(!IndexFsck.fsck(spark, s"$base/lm").exists(_.check == "pending_deletes"))
    LmIndex.buildModel(spark,
      corpus.filter(col("doc_id") =!= 3L), s"$base/lm-rebuilt")
    assert(lmScores(s"$base/lm") === lmScores(s"$base/lm-rebuilt"))

    // clean store: repair must not rewrite anything
    assert(IndexFsck.repair(spark, s"$base/lm") === false)
    // unknown dir: no family row, nothing to run
    assert(IndexFsck.repair(spark, s"$base/nowhere") === false)
  }

  test("sweepLogged(applyNow): the audit ledger records the retirement " +
      "actions") {
    val base = tmp("graft-applylog")
    SearchIndex.buildIndex(spark, corpus, s"$base/search")
    val victims = corpus.filter(col("doc_id") === 1L)
    Takedown.sweepLogged(spark, "req-apply-1", victims,
      Seq(s"$base/search"), s"$base/audit", applyNow = true)
    val log = Takedown.sweepLog(spark, s"$base/audit")
      .select("request_id", "family", "action").collect().map(_.toSeq)
    assert(log.toSet === Set(Seq("req-apply-1", "search", "deleted_applied")))
  }
}
