package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.{IndexFsck, SearchIndex, WinnowIndex}

/** The fsck fleet lane ([[DocStream.fsckStream]]): store health checking
  * wired to the maintenance cadence, so a planted invariant break in one
  * store of a RUNNING multi-stream topology surfaces within `every`
  * batches — findings to the callback and the persisted findings ledger —
  * with no operator in the loop. */
class FsckStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a planted break in one store of a running two-stream topology " +
      "surfaces within `every` batches, in the callback AND the ledger") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsckstream").toString
    val searchIdx = s"$base/search"
    val winnowIdx = s"$base/winnow"
    val logDir = s"$base/health"
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // store 1 under live maintenance; store 2 a one-shot build the fsck
    // lane also watches (the fleet shape: one manifest, many stores)
    WinnowIndex.buildIndex(spark,
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), winnowIdx)

    val docsIn = MemoryStream[(Long, String)]
    val maint = DocStream.searchIndexMaintenanceStream(
      spark, docsIn.toDF().toDF("doc_id", "text"), searchIdx)
    val ticksIn = MemoryStream[Long]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[Seq[IndexFsck.Finding]]
    val fsckQ = DocStream.fsckStream(
      spark, ticksIn.toDF(), Seq(searchIdx, winnowIdx),
      every = 2, logDir = Some(logDir)) { fs => reports += fs; () }
    try {
      docsIn.addData((1L, "hit f1 f2"), (2L, "hit f3 f4"))
      maint.processAllAvailable()

      // batch 1: below cadence — no scan
      ticksIn.addData(1L); fsckQ.processAllAvailable()
      assert(reports.isEmpty)
      // batch 2: scan runs, fleet healthy — findings reported (ok rows),
      // nothing escalates, ledger stays empty
      ticksIn.addData(2L); fsckQ.processAllAvailable()
      assert(reports.size === 1)
      assert(!reports.head.exists(_.status == "error"),
        s"healthy fleet must scan clean: ${reports.head}")
      assert(IndexFsck.findingsLog(spark, logDir).count() === 0L)

      // PLANT the break: the winnow members twin vanishes out from under
      // the store (required table missing + members-twin invariant)
      val members = new java.io.File(s"$winnowIdx/members.parquet")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(members)

      // within `every` = 2 more batches the break surfaces — no operator
      ticksIn.addData(3L); fsckQ.processAllAvailable()
      ticksIn.addData(4L); fsckQ.processAllAvailable()
      assert(reports.size === 2)
      val errs = reports.last.filter(f =>
        f.dir == winnowIdx && f.status == "error")
      assert(errs.exists(_.check == "table_missing"),
        s"the planted break must surface as an error finding: ${reports.last}")
      // the healthy co-tenant store stays clean in the same scan
      assert(!reports.last.exists(f => f.dir == searchIdx && f.status == "error"))
      // and the detection is DURABLE: the findings ledger holds it even
      // if this driver dies before an operator looks
      val logged = IndexFsck.findingsLog(spark, logDir)
        .filter(col("dir") === winnowIdx && col("status") === "error")
      assert(logged.filter(col("check") === "table_missing").count() >= 1L)
    } finally { fsckQ.stop(); maint.stop() }
  }

  test("repairPending: the fleet lane retires pending deletions on a " +
      "store NO maintenance stream compacts — the read tax ends unattended") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsckrepair").toString
    val idx = s"$base/lm"
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (1L, "alpha beta alpha", "en", "s0"),
      (2L, "gamma delta epsilon", "de", "s0"),
      (3L, "alpha beta delta", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    graft.operators.LmIndex.buildModel(spark, corpus, idx)
    graft.operators.Takedown.sweep(spark,
      corpus.filter(col("doc_id") === 2L), Seq(idx))
    assert(graft.operators.IndexPolicy.pendingDeletes(spark, idx))

    val ticksIn = MemoryStream[Long]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[Seq[IndexFsck.Finding]]
    val q = DocStream.fsckStream(spark, ticksIn.toDF(), Seq(idx),
      every = 1, repairPending = true) { fs => reports += fs; () }
    try {
      ticksIn.addData(1L); q.processAllAvailable()
    } finally q.stop()
    assert(reports.head.exists(_.check == "pending_deletes_repaired"))
    assert(!graft.operators.IndexPolicy.pendingDeletes(spark, idx),
      "the fleet lane must have run the registry compact")
    // and the retirement is the real one: store ≡ rebuild-minus-victim
    graft.operators.LmIndex.buildModel(spark,
      corpus.filter(col("doc_id") =!= 2L), s"$base/rebuilt")
    val probe = Seq((9L, "alpha delta")).toDF("doc_id", "text")
    assert(graft.operators.LmIndex.scoreDocs(spark, probe, idx)
      .collect().map(_.toSeq).toSet ===
      graft.operators.LmIndex.scoreDocs(spark, probe, s"$base/rebuilt")
        .collect().map(_.toSeq).toSet)
    // a second scan on the now-clean store repairs nothing
    assert(!IndexFsck.fsck(spark, idx).exists(_.check == "pending_deletes"))
  }

  test("repair work is BUDGETED per scan: three pending stores with " +
      "budget 1 retire across successive scans, findings delivered " +
      "every scan (a pending manifest cannot become a compact storm)") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsckbudget").toString
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (1L, "alpha beta alpha", "en", "s0"),
      (2L, "gamma delta epsilon", "de", "s0"),
      (3L, "alpha beta delta", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val stores = (1 to 3).map(i => s"$base/lm$i")
    stores.foreach { idx =>
      graft.operators.LmIndex.buildModel(spark, corpus, idx)
      graft.operators.Takedown.sweep(spark,
        corpus.filter(col("doc_id") === 2L), Seq(idx))
      assert(graft.operators.IndexPolicy.pendingDeletes(spark, idx))
    }
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[Seq[IndexFsck.Finding]]
    def pendingCount: Int =
      stores.count(graft.operators.IndexPolicy.pendingDeletes(spark, _))
    (1L to 3L).foreach { scan =>
      DocStream.processFsckBatch(spark, stores, scan, every = 1,
        repairPending = true, repairBudget = 1) { fs => reports += fs; () }
      // exactly ONE store retired per scan — the budget bounds the tick
      assert(pendingCount === 3 - scan.toInt,
        s"scan $scan must retire exactly one store's pending deletions")
      // findings still delivered every scan, including the un-repaired
      // stores' pending_deletes rows (they surface, they just wait)
      assert(reports.size === scan.toInt)
      assert(reports.last.count(_.check == "pending_deletes_repaired") === 1)
      // the scan observes pre-repair state: every store still pending at
      // scan START surfaces (including the one this scan then retires)
      assert(reports.last.count(_.check == "pending_deletes") === 4 - scan.toInt,
        s"un-budgeted stores must still surface as pending: ${reports.last}")
    }
    // every store's retirement is the real one
    stores.foreach { idx =>
      assert(!graft.operators.IndexPolicy.pendingDeletes(spark, idx))
    }
  }

  test("the repair budget ROTATES its starting store: a manifest-head " +
      "store that re-accumulates pending deletions every interval " +
      "cannot starve later stores of retirement (review r14)") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsckrot").toString
    val corpus = Seq(
      (1L, "alpha beta alpha", "en", "s0"),
      (2L, "gamma delta epsilon", "de", "s0"),
      (3L, "alpha beta delta", "en", "s1"),
      (4L, "zeta eta theta", "de", "s1")).toDF("doc_id", "text", "lang", "source")
    val stores = (1 to 3).map(i => s"$base/lm$i")
    stores.foreach { idx =>
      graft.operators.LmIndex.buildModel(spark, corpus, idx)
      graft.operators.Takedown.sweep(spark,
        corpus.filter(col("doc_id") === 2L), Seq(idx))
    }
    val head = stores.head
    (1L to 4L).foreach { scan =>
      DocStream.processFsckBatch(spark, stores, scan, every = 1,
        repairPending = true, repairBudget = 1) { _ => () }
      // the adversarial tenant: the HEAD store goes pending again
      // immediately after every scan (fresh victim per scan so the
      // sweep is never a no-op replay)
      graft.operators.Takedown.sweep(spark,
        corpus.filter(col("doc_id") === (scan % 4 + 1)), Seq(head))
    }
    // head-first budgeting would have spent all four scans on the head
    // store; rotation must have reached and retired BOTH tail stores
    stores.tail.foreach { idx =>
      assert(!graft.operators.IndexPolicy.pendingDeletes(spark, idx),
        s"rotation must retire $idx despite the head store re-pending " +
          "every scan")
    }
  }
}
