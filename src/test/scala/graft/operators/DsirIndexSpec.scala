package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted DSIR distribution estimate ([[DsirIndex]]): indexed ≡
  * inline selection scoring, append ≡ rebuild by counter addition,
  * replay/compaction invariance, directional votes, streaming
  * maintenance. */
class DsirIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // target ('en') docs use words disjoint from the 'de' doc, so bucket
  // votes are sign-determined per word origin (collisions between an
  // en-only and de-only word would have to land in one of 512 buckets —
  // and these fixed words don't)
  private def corpusA = Seq(
    (1L, "alpha beta alpha", "en"),
    (2L, "gamma delta", "de")).toDF("doc_id", "text", "lang")

  test("q_dsir_vote_indexed ≡ q_dsir_vote on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val a = QueryRegistry.byName("q_dsir_vote").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_dsir_vote_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("served votes are directional: target-only words +1, off-target -1") {
    val idx = java.nio.file.Files.createTempDirectory("graft-dsir").toString + "/idx"
    DsirIndex.buildIndex(spark, corpusA, idx)
    val got = DsirIndex.scoreDocs(spark, Seq(
      (10L, "alpha beta"),   // en-exclusive vocabulary → +2
      (11L, "gamma gamma"),  // de-exclusive vocabulary → -2
      (12L, "alpha delta")).toDF("doc_id", "text"), idx)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      10L -> ((2L, 2L)),
      11L -> ((2L, -2L)),
      12L -> ((2L, 0L))))
  }

  test("append ≡ rebuild; replayed batches are no-ops; compaction is invariant") {
    val base = java.nio.file.Files.createTempDirectory("graft-dsirinc").toString
    val oneShot = s"$base/oneshot"
    DsirIndex.buildIndex(spark, corpusA, oneShot)
    def totals(d: String) = DsirIndex.bucketTotals(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = totals(oneShot)

    val inc = s"$base/inc"
    // streamed arrival in two batches, second re-delivered (crash window)
    Seq(
      corpusA.filter(col("doc_id") === 1L),
      corpusA.filter(col("doc_id") === 2L),
      corpusA.filter(col("doc_id") === 2L)).foreach { b =>
      graft.streaming.DocStream.processDsirIndexBatch(spark, inc, b)
    }
    assert(totals(inc) === want)
    assert(DsirIndex.residentDocIds(spark, inc).count() === 2L)
    DsirIndex.compact(spark, inc)
    val epochs = new java.io.File(s"$inc/buckets.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    assert(epochs === 1)
    assert(totals(inc) === want)
    // the streamed store serves the same scores as the one-shot build
    val probe = Seq((20L, "alpha gamma beta")).toDF("doc_id", "text")
    def score(d: String) = DsirIndex.scoreDocs(spark, probe, d)
      .collect().map(_.toSeq).toSet
    assert(score(inc) === score(oneShot))
  }

  test("dsirIndexMaintenanceStream wiring builds the store through the query") {
    val base = java.nio.file.Files.createTempDirectory("graft-dsirwire").toString
    val idx = s"$base/idx"
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocStream.dsirIndexMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "text", "lang"), idx)
    try {
      input.addData((1L, "alpha beta alpha", "en"))
      q.processAllAvailable()
      input.addData((2L, "gamma delta", "de"))
      q.processAllAvailable()
    } finally q.stop()
    val got = DsirIndex.scoreDocs(
      spark, Seq((10L, "alpha beta")).toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((10L, 2L, 2L)))
  }
}
