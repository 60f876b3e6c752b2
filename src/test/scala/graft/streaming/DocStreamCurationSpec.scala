package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Curation-at-ingest (round-9, verdict #7): the composed funnel as a
  * streaming lane. The operative contract is CUMULATIVE ≡ BATCH — after
  * micro-batch N, the emitted attrition ledger equals the one-shot
  * funnel over the union of batches 1..N (possible because every store
  * the funnel reads is append≡rebuild exact; the order-dependent drift
  * of eager at-ingest dedup lanes structurally cannot occur here). Run
  * on real fixture documents (sf0.001) split into 3 batches, with a
  * whole re-delivered batch. */
class DocStreamCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val allDocs =
    graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

  private def batchOf(lo: Long, hi: Long): DataFrame =
    allDocs.filter(col("doc_id") >= lo && col("doc_id") < hi)

  /** One-shot reference: fresh stores built over `union` in their own
    * dirs, ledger read from them — equal to the inline funnel by the
    * spec-pinned component equalities (IndexedFunnelSpec). */
  private def referenceLedger(union: DataFrame): Map[String, (Long, Long)] = {
    val base = java.nio.file.Files.createTempDirectory("graft-curef").toString
    graft.operators.ClassifyIndex.buildModel(spark, union, s"$base/clf")
    graft.operators.LmIndex.buildModel(spark, union, s"$base/lm")
    graft.operators.WinnowIndex.buildIndex(spark, union, s"$base/winnow")
    toMap(graft.operators.CurationFunnel.storesLedger(
      spark, union, s"$base/clf", s"$base/lm", s"$base/winnow").collect())
  }

  private def toMap(rows: Array[Row]): Map[String, (Long, Long)] =
    rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("cumulative streamed ledger ≡ one-shot funnel on the union, 3 batches + re-delivery") {
    val base = java.nio.file.Files.createTempDirectory("graft-custream").toString
    var emitted: Map[String, (Long, Long)] = Map.empty
    def process(b: DataFrame): Unit =
      DocStream.processCurationFunnelBatch(spark, base, b,
        graft.operators.IndexPolicy.CompactEvery,
        df => emitted = toMap(df.collect()))

    val cuts = Seq((0L, 400L), (400L, 800L), (800L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      process(batchOf(lo, hi))
      val union = batchOf(0L, hi)
      val ref = referenceLedger(union)
      assert(emitted === ref, s"after batch ${i + 1}: streamed ledger must " +
        "equal the one-shot funnel over the arrived union")
      assert(emitted("1_total")._1 === union.count(), s"batch ${i + 1} total")
    }
    assert(emitted("1_total")._1 === allDocs.count())
    val finalLedger = emitted

    // a whole re-delivered batch is absorbed by the resident ledgers and
    // re-emits the identical cumulative ledger (at-least-once emit,
    // idempotent content) — and folds nothing twice into corpus/stores
    val corpusBefore = spark.read.parquet(s"$base/corpus.parquet").count()
    process(batchOf(400L, 800L))
    assert(emitted === finalLedger, "re-delivery must re-emit the same ledger")
    assert(spark.read.parquet(s"$base/corpus.parquet").count() === corpusBefore)
  }

  test("a pre-round-10 FLAT resident corpus migrates into epoch=0 on the " +
      "first post-upgrade batch instead of wedging partition discovery") {
    val base = java.nio.file.Files.createTempDirectory("graft-cumigrate").toString
    // the legacy layout: flat mode-append part files at the table root
    batchOf(0L, 300L).write.mode("append").parquet(s"$base/corpus.parquet")
    var emitted: Map[String, (Long, Long)] = Map.empty
    DocStream.processCurationFunnelBatch(spark, base, batchOf(300L, 600L),
      graft.operators.IndexPolicy.CompactEvery,
      df => emitted = toMap(df.collect()))
    // the mixed flat+epoch= layout would fail this read outright; after
    // migration the resident corpus is the union of legacy + fresh docs
    val corpus = spark.read.parquet(s"$base/corpus.parquet")
    assert(corpus.count() === batchOf(0L, 600L).count())
    assert(new java.io.File(s"$base/corpus.parquet/epoch=0").isDirectory)
    assert(!new java.io.File(s"$base/corpus.parquet.flat-legacy").exists())
    // replay safety survives the migration: legacy docs are resident, so
    // a re-delivered overlapping batch folds nothing twice
    DocStream.processCurationFunnelBatch(spark, base, batchOf(0L, 600L),
      graft.operators.IndexPolicy.CompactEvery, _ => ())
    assert(spark.read.parquet(s"$base/corpus.parquet").count()
      === batchOf(0L, 600L).count())
  }

  test("curationFunnelStream wiring emits through the streaming query") {
    val base = java.nio.file.Files.createTempDirectory("graft-custream2").toString
    var emitted: Map[String, (Long, Long)] = Map.empty
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Timestamp, String, String, String)]
    val q = DocStream.curationFunnelStream(
      spark,
      input.toDF().toDF("doc_id", "ts", "lang", "source", "text"),
      base)(df => emitted = toMap(df.collect()))
    try {
      val t0 = new Timestamp(1700000000000L)
      val rows = allDocs.filter(col("doc_id") < 300L)
        .collect().map(r => (r.getLong(0), t0, r.getString(1), r.getString(2), r.getString(3)))
      input.addData(rows.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted === referenceLedger(batchOf(0L, 300L)))
  }
}
