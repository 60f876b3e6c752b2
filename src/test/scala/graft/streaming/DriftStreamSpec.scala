package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.{DriftMonitor, IndexFsck}

/** The distribution-drift stream lane ([[DocStream.driftMonitorStream]]):
  * live batches judged against a persisted share baseline, alerts into
  * the same findings ledger as the fsck lane. The census geometry itself
  * is hash-gated through `q_corpus_drift` (CorpusDiff.bucketShares is the
  * shared body); these pin the alerting contract around it. */
class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("source"), col("text"))

  test("an in-distribution batch is silent; a length-skewed batch alerts " +
      "within one micro-batch, in the callback AND the ledger") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val monDir = s"$base/monitor"
    val logDir = s"$base/health"
    DriftMonitor.writeBaseline(spark, docs, monDir)

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String, String)]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[Seq[IndexFsck.Finding]]
    val q = DocStream.driftMonitorStream(
      spark, in.toDF().toDF("doc_id", "source", "text"), monDir,
      thresholdPm = 100L, minDocs = 5L, logDir = Some(logDir)) { fs =>
      reports += fs; ()
    }
    try {
      // batch 1: the baseline corpus itself — identical shares, silence
      in.addData(docs.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))))
      q.processAllAvailable()
      assert(reports.size === 1 && reports.head.isEmpty,
        s"in-distribution batch must not alert: ${reports.headOption}")

      // batch 2: only the LONGEST documents — the length profile the
      // baseline never saw; every judged source's short buckets vanish
      val skewed = docs
        .filter(length(col("text")) >= 400)
        .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(skewed.size >= 5, "fixture must have enough long docs")
      in.addData(skewed)
      q.processAllAvailable()
      assert(reports.size === 2 && reports(1).nonEmpty,
        "a skewed batch must alert")
      assert(reports(1).forall(f =>
        f.check == "distribution_drift" && f.status == "warn"))
      val ledger = IndexFsck.findingsLog(spark, logDir)
      assert(ledger.filter(col("check") === "distribution_drift").count() ===
        reports(1).size.toLong, "alerts persist to the findings ledger")
    } finally q.stop()
  }

  test("a below-minDocs trickle source is not judged; an empty batch " +
      "reports clean without touching the baseline") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    val monDir = s"$base/monitor"
    DriftMonitor.writeBaseline(spark, docs, monDir)

    // 3 pathological docs from one source: far under minDocs=20 — noise,
    // not a distribution; the lane must stay silent
    val trickle = Seq(
      (900001L, docs.select(col("source")).head.getString(0), "x"),
      (900002L, docs.select(col("source")).head.getString(0), "y"),
      (900003L, docs.select(col("source")).head.getString(0), "z"))
      .toDF("doc_id", "source", "text")
    var got: Seq[IndexFsck.Finding] = null
    DocStream.processDriftBatch(spark, trickle, monDir,
      thresholdPm = 100L, minDocs = 20L)(fs => got = fs)
    assert(got != null && got.isEmpty,
      s"a trickle source must not be judged: $got")

    DocStream.processDriftBatch(spark, trickle.filter(lit(false)), monDir,
      thresholdPm = 100L, minDocs = 20L)(fs => got = fs)
    assert(got.isEmpty, "an empty batch reports clean")
  }

  test("a missing baseline is an error FINDING, not a dead stream: the " +
      "census failure rides the same isolation as a ledger-write failure") {
    // monitor started before writeBaseline ever ran — driftFindings would
    // throw on the unreadable path; the batch must surface drift_failed
    // through report() and leave the caller (the streaming query) alive
    val ghost = java.nio.file.Files.createTempDirectory("graft-drift-none")
      .toString + "/never-written"
    var got: Seq[IndexFsck.Finding] = null
    DocStream.processDriftBatch(spark, docs, ghost,
      thresholdPm = 100L, minDocs = 5L)(fs => got = fs)
    assert(got != null && got.size === 1, s"exactly one error finding: $got")
    assert(got.head.family === "drift" && got.head.status === "error" &&
      got.head.check === "drift_failed", s"unexpected finding: ${got.head}")
  }

  test("drift arithmetic: appearing and vanishing buckets both surface, " +
      "and the self-comparison is exactly zero") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift3").toString
    val monDir = s"$base/monitor"
    DriftMonitor.writeBaseline(spark, docs, monDir)
    val self = DriftMonitor.drift(spark, docs, monDir, minDocs = 1L)
    assert(self.filter(col("delta_pm") =!= 0L).count() === 0,
      "a corpus compared against its own baseline has zero drift")
    // a batch living entirely in one extreme bucket: for judged sources
    // the baseline's other buckets must appear with batch_pm = 0
    val skew = DriftMonitor.drift(
      spark, docs.filter(length(col("text")) >= 400), monDir, minDocs = 1L)
    assert(skew.filter(col("batch_pm") === 0L && col("base_pm") > 0L)
      .count() > 0, "vanished buckets surface")
    assert(skew.groupBy(col("source"))
      .agg(sum(col("batch_pm")).as("s")).filter(col("s") > 1000).count() === 0)
  }

  test("a source the baseline has never seen surfaces as drift (its rows " +
      "survive the full join with base_pm = 0)") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift4").toString
    val monDir = s"$base/monitor"
    DriftMonitor.writeBaseline(spark, docs, monDir)
    val novel = (1L to 30L).map(i =>
      (800000L + i, "brand-new-crawl", s"doc $i with some words of text"))
      .toDF("doc_id", "source", "text")
    val d = DriftMonitor.drift(spark, novel, monDir, minDocs = 20L)
      .filter(col("source") === "brand-new-crawl")
    assert(d.count() > 0, "an unbaselined source must not vanish")
    assert(d.filter(col("base_pm") =!= 0L).count() === 0)
    assert(d.filter(col("delta_pm") > 0L).count() > 0,
      "all its mass reads as drift until an operator re-baselines")
  }
}
