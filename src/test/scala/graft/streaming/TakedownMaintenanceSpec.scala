package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.{IndexPolicy, SearchIndex}

/** The production topology the round-11 advisory named: a maintenance
  * stream and a takedown stream running as SEPARATE StreamingQueries
  * over ONE store. Pins the full loop end to end — the takedown lands
  * serialized ([[graft.operators.StoreLock]]), the NEXT maintenance
  * batch's `maybeCompact` is FORCED by the pending deletion
  * ([[IndexPolicy.pendingDeletes]], bounding the pending-read tax to
  * one cycle), the deletion is durable, and the store equals a rebuild
  * that ingested the same batches minus the victim. */
class TakedownMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("takedown stream + maintenance stream on one store: the pending " +
      "deletion forces the next cycle's compact and survives it") {
    val base = java.nio.file.Files.createTempDirectory("graft-tdmaint").toString
    val idx = s"$base/search"
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val docsIn = MemoryStream[(Long, String)]
    val reqsIn = MemoryStream[Long]
    val maint = DocStream.searchIndexMaintenanceStream(
      spark, docsIn.toDF().toDF("doc_id", "text"), idx,
      compactEvery = 1000) // epoch trigger effectively OFF — only the
                           // pending-deletion trigger can fire
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[graft.operators.Takedown.StoreResult]
    val takedown = DocStream.takedownStream(
      spark, reqsIn.toDF().toDF("doc_id"), Seq(idx)) { rs => reports ++= rs; () }
    try {
      docsIn.addData((1L, "hit f1 f2 f3"), (2L, "hit hit f1 f2"))
      maint.processAllAvailable()
      docsIn.addData((3L, "hit hit hit hit"))
      maint.processAllAvailable()
      assert(IndexPolicy.epochCount(spark, s"$idx/postings.parquet") === 2)

      // the takedown lands between maintenance cycles (id-only: search
      // is doc-keyed, no corpus needed)
      reqsIn.addData(2L)
      takedown.processAllAvailable()
      assert(reports.map(r => r.family -> r.action) === Seq("search" -> "deleted"))
      assert(IndexPolicy.pendingDeletes(spark, idx))
      // immediate read-path exclusion while pending
      assert(SearchIndex.searchFromIndex(spark, idx, Seq("hit"), 10)
        .filter(col("doc_id") === 2L).count() === 0L)

      // the NEXT maintenance batch: epoch count (3) is far below the
      // 1000 threshold, so ONLY the forced-by-pending trigger can have
      // compacted — and it must have
      docsIn.addData((4L, "hit f9"))
      maint.processAllAvailable()
      assert(!IndexPolicy.pendingDeletes(spark, idx),
        "the pending deletion must force the next cycle's compact")
      assert(IndexPolicy.epochCount(spark, s"$idx/postings.parquet") === 1)
      assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    } finally { maint.stop(); takedown.stop() }

    // durable: the store equals a rebuild that never saw the victim
    val rebuilt = s"$base/rebuilt"
    SearchIndex.buildIndex(spark,
      Seq((1L, "hit f1 f2 f3"), (3L, "hit hit hit hit"), (4L, "hit f9"))
        .toDF("doc_id", "text"), rebuilt)
    def bm25(d: String) = SearchIndex.bm25FromIndex(spark, d, Seq("hit"), 10)
      .collect().map(_.toSeq).toSet
    assert(bm25(idx) === bm25(rebuilt))
    // and the fleet check reads clean
    assert(graft.operators.IndexFsck.fsck(spark, idx)
      .map(f => f.check -> f.status) === Seq("all" -> "ok"))
  }
}
