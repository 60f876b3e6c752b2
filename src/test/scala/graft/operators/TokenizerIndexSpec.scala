package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted BPE tokenizer ([[TokenizerIndex]]): indexed ≡ inline
  * encoding, the frozen-model contract, merge-rate drift detection with
  * swap retrain, exactly-once observation counters under replay, and the
  * encode-at-ingest lane. */
class TokenizerIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Corpus A: hand-traced 4-step training fixture (see asserts below).
  private def corpusA = Seq(
    (1L, "a b a b a b"),
    (2L, "c d")).toDF("doc_id", "text")

  test("q_bpe_encode_indexed ≡ q_bpe_encode on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val a = QueryRegistry.byName("q_bpe_encode").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_bpe_encode_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("build freezes the hand-traced merge table; encode applies it in order") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tok").toString + "/idx"
    TokenizerIndex.buildIndex(spark, corpusA, idx)
    // step-by-step trace: (a,b)×3 wins; then the merged pairs cascade;
    // step 3 is the cnt-1 lexicographic tie (a_b_a_b < c); (c,d) last
    assert(TokenizerIndex.readMerges(spark, idx) === Seq(
      (1L, "a", "b", 3L),
      (2L, "a_b", "a_b", 2L),
      (3L, "a_b_a_b", "a_b", 1L),
      (4L, "c", "d", 1L)))
    // frozen model applied to UNSEEN text: merges fire in learned order
    val got = TokenizerIndex.encodeDocs(
      spark, Seq((9L, "a b c d e")).toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((9L, 5L, 3L, 2L))) // "a_b c_d e"
  }

  test("merge-rate drift: healthy serving holds, stale serving trips, retrain re-arms") {
    val base = java.nio.file.Files.createTempDirectory("graft-tokdrift").toString
    val idx = s"$base/idx"
    TokenizerIndex.buildIndex(spark, corpusA, idx)
    // training baseline: raw 8 tokens, 6 merged → rate 0.75
    val r0 = TokenizerIndex.mergeRateReport(spark, idx)
    assert(r0.baselineRate === 0.75 && r0.servedTokens === 0L && !r0.retrain)
    // a well-matched batch: "a b a b" → 3 of 4 merged, rate 0.75 — no drift
    TokenizerIndex.observeBatch(spark, idx, Seq((5L, "a b a b")).toDF("doc_id", "text"))
    assert(!TokenizerIndex.mergeRateReport(spark, idx).retrain)
    // vocabulary-miss batch: no learned merge fires → cumulative served
    // rate 3/8 decays below baseline/1.5 → drift declared
    TokenizerIndex.observeBatch(spark, idx, Seq((6L, "z z z z")).toDF("doc_id", "text"))
    val r2 = TokenizerIndex.mergeRateReport(spark, idx)
    assert(r2.servedTokens === 8L && r2.servedRate === 0.375 && r2.retrain)
    // drift-triggered retrain from the new corpus: swapped model serves
    // the NEW vocabulary, fresh baseline re-arms the detector
    val corpusB = Seq((20L, "x y x y x y x y"), (21L, "p q p q")).toDF("doc_id", "text")
    assert(TokenizerIndex.maybeRetrain(spark, idx, corpusB))
    assert(TokenizerIndex.readMerges(spark, idx).head === ((1L, "x", "y", 4L)))
    val r3 = TokenizerIndex.mergeRateReport(spark, idx)
    assert(r3.servedTokens === 0L && !r3.retrain)
    // healthy again → no second retrain
    assert(!TokenizerIndex.maybeRetrain(spark, idx, corpusB))
  }

  test("observation counters are exactly-once under replay; compaction is invariant") {
    val base = java.nio.file.Files.createTempDirectory("graft-tokreplay").toString
    val idx = s"$base/idx"
    TokenizerIndex.buildIndex(spark, corpusA, idx)
    val batch = Seq((7L, "a b x")).toDF("doc_id", "text")
    var emits = 0
    graft.streaming.DocStream.processBpeEncodeBatch(spark, idx, batch) { enc =>
      emits += 1
      // serving output rides the frozen merges: "a_b x"
      assert(enc.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq === Seq((7L, 3L, 1L)))
    }
    val once = TokenizerIndex.mergeRateReport(spark, idx)
    // re-delivery: emission is at-least-once, counters don't move
    graft.streaming.DocStream.processBpeEncodeBatch(spark, idx, batch) { _ => emits += 1 }
    assert(emits === 2)
    val twice = TokenizerIndex.mergeRateReport(spark, idx)
    assert(once === twice && once.servedTokens === 3L)
    TokenizerIndex.compact(spark, idx)
    val epochs = new java.io.File(s"$idx/stats.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    assert(epochs === 1)
    assert(TokenizerIndex.mergeRateReport(spark, idx) === once)
  }

  test("observe crash window: stats without their ledger twin neither " +
      "skew the drift signal nor double-count on replay (EpochLedger protocol)") {
    val base = java.nio.file.Files.createTempDirectory("graft-tokcrash").toString
    val idx = s"$base/idx"
    TokenizerIndex.buildIndex(spark, corpusA, idx)
    val batch = Seq((5L, "a b a b")).toDF("doc_id", "text")
    TokenizerIndex.observeBatch(spark, idx, batch)
    // simulate the crash BETWEEN the two renames: the stats epoch
    // committed, the ledger rename never happened
    val orphanLedger = new org.apache.hadoop.fs.Path(s"$idx/docs.parquet/epoch=1")
    orphanLedger.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(orphanLedger, true)
    // the drift signal skips the uncommitted residue entirely
    val mid = TokenizerIndex.mergeRateReport(spark, idx)
    assert(mid.servedTokens === 0L)
    // the replayed batch lands exactly once: the reconcile deletes the
    // orphaned stats epoch before the rewrite
    TokenizerIndex.observeBatch(spark, idx, batch)
    val after = TokenizerIndex.mergeRateReport(spark, idx)
    assert(after.servedTokens === 4L && after.servedRate === 0.75)
  }

  test("bpeEncodeStream wiring emits encoded batches through the query") {
    val base = java.nio.file.Files.createTempDirectory("graft-tokwire").toString
    val idx = s"$base/idx"
    TokenizerIndex.buildIndex(spark, corpusA, idx)
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = graft.streaming.DocStream.bpeEncodeStream(
      spark, input.toDF().toDF("doc_id", "text"), idx) { enc =>
      emitted ++= enc.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      ()
    }
    try {
      input.addData((100L, "a b c d e"))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.toList === List((100L, 5L, 3L, 2L)))
    assert(TokenizerIndex.residentDocIds(spark, idx).count() === 3L) // 2 train + 1 observed
  }
}
