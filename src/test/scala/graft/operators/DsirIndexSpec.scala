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

  test("append crash window: counters without their ledger twin neither " +
      "skew reads nor double-count on replay (EpochLedger protocol)") {
    val base = java.nio.file.Files.createTempDirectory("graft-dsircrash").toString
    val idx = s"$base/idx"
    DsirIndex.buildIndex(spark, corpusA, idx)
    def totals(d: String) = DsirIndex.bucketTotals(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = totals(idx)
    val batch = Seq((3L, "epsilon zeta", "en")).toDF("doc_id", "text", "lang")
    DsirIndex.appendToIndex(spark, idx, batch)
    // simulate the crash BETWEEN the two renames: the counter epoch
    // committed, the ledger rename never happened
    val orphanLedger = new org.apache.hadoop.fs.Path(s"$idx/docs.parquet/epoch=1")
    orphanLedger.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(orphanLedger, true)
    // reads skip the uncommitted residue — the served model is unchanged
    assert(totals(idx) === before)
    assert(DsirIndex.residentDocIds(spark, idx).count() === 2L)
    // a COMPACT arriving before the replay must not fold the residue
    // into the committed epoch=0 (that would launder the double-count:
    // the residue stops being partition-prunable and the replayed batch
    // then lands a second time) — it reconciles the orphan away instead
    DsirIndex.compact(spark, idx)
    assert(totals(idx) === before)
    // the replayed batch (the ledger says it is absent) lands exactly
    // once: the reconcile deletes any remaining orphaned counter epoch
    DsirIndex.appendToIndex(spark, idx, batch)
    val oneShot = s"$base/oneshot"
    DsirIndex.buildIndex(spark, corpusA.union(batch), oneShot)
    assert(totals(idx) === totals(oneShot))
    assert(DsirIndex.residentDocIds(spark, idx).count() === 3L)
  }

  test("serving out-of-distribution words: an unseen-bucket word counts " +
      "toward n_tokens with a neutral vote") {
    val idx = java.nio.file.Files.createTempDirectory("graft-dsirood").toString + "/idx"
    DsirIndex.buildIndex(spark, corpusA, idx)
    // replicate the word→bucket hash (fold (acc*31 + ascii) mod P, then
    // mod 512) to pick a probe word whose bucket is EMPTY in the store
    val P = graft.functions.PolyMinHash.P
    def bucketOf(w: String): Long =
      math.floorMod(w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P), 512L)
    val occupied = DsirIndex.bucketTotals(spark, idx)
      .collect().map(_.getLong(0)).toSet
    val ood = Iterator.from(0).map(i => s"ood$i")
      .find(w => !occupied(bucketOf(w))).get
    val got = DsirIndex.scoreDocs(
      spark, Seq((40L, s"alpha $ood")).toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // alpha is target-exclusive (+1); the unseen word votes 0 but MUST
    // count toward n_tokens — the old inner join dropped it entirely
    assert(got.toSeq === Seq((40L, 2L, 1L)))
  }
}
