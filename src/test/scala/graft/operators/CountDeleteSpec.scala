package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deletion for the count-model families ([[NegEpochs]]): the additive
  * arithmetic run in reverse. Per family: immediate serve-path parity
  * with a rebuild that never saw the doc, replayed-takedown no-op,
  * shadowed re-append, and the deletion-applying compact (whole-store
  * swap) after which re-insertion is a normal append. */
class CountDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  // --- LmIndex ------------------------------------------------------------

  private def lmCorpus = Seq(
    (1L, "a b c a b"),
    (2L, "a b a b"),
    (3L, "x y z")).toDF("doc_id", "text")

  private def lmScores(d: String, docs: DataFrame) =
    LmIndex.scoreDocs(spark, docs, d).collect().map(_.toSeq).toSet

  test("LmIndex: delete nets the victim's counts out, bit-parity with rebuild") {
    val base = tmp("graft-lmdel")
    val full = s"$base/full"
    LmIndex.buildModel(spark, lmCorpus, full)
    val rebuilt = s"$base/rebuilt"
    LmIndex.buildModel(spark, lmCorpus.filter(col("doc_id") =!= 2L), rebuilt)
    val probe = Seq((10L, "a b a"), (11L, "x y")).toDF("doc_id", "text")

    LmIndex.deleteFromModel(spark, full, lmCorpus.filter(col("doc_id") === 2L))
    // immediate: scores AND resident ledger match the never-saw-it store
    assert(lmScores(full, probe) === lmScores(rebuilt, probe))
    assert(LmIndex.residentDocIds(spark, full).collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    // replayed takedown is a no-op (victims already deleted)
    LmIndex.deleteFromModel(spark, full, lmCorpus.filter(col("doc_id") === 2L))
    assert(lmScores(full, probe) === lmScores(rebuilt, probe))
    // a re-appended victim stays dead until the deletion-applying compact
    LmIndex.appendToModel(spark, full, lmCorpus.filter(col("doc_id") === 2L))
    assert(lmScores(full, probe) === lmScores(rebuilt, probe))
    // the apply: whole-store swap retires the deletion state
    LmIndex.compact(spark, full)
    assert(lmScores(full, probe) === lmScores(rebuilt, probe))
    assert(!new java.io.File(s"$full/dels.parquet").exists())
    assert(!new java.io.File(s"$full/neg-pairs.parquet").exists())
    // after the durable apply, re-insertion is a normal append
    LmIndex.appendToModel(spark, full, lmCorpus.filter(col("doc_id") === 2L))
    val restored = s"$base/restored"
    LmIndex.buildModel(spark, lmCorpus, restored)
    assert(lmScores(full, probe) === lmScores(restored, probe))
  }

  test("LmIndex: an intra-batch DUPLICATE victim row subtracts once (the " +
      "at-least-once request stream can carry a doc twice in one batch)") {
    val base = tmp("graft-lmdup")
    val full = s"$base/full"
    LmIndex.buildModel(spark, lmCorpus, full)
    val rebuilt = s"$base/rebuilt"
    LmIndex.buildModel(spark, lmCorpus.filter(col("doc_id") =!= 2L), rebuilt)
    val dup = lmCorpus.filter(col("doc_id") === 2L)
      .unionByName(lmCorpus.filter(col("doc_id") === 2L))
    LmIndex.deleteFromModel(spark, full, dup)
    val probe = Seq((10L, "a b a")).toDF("doc_id", "text")
    assert(lmScores(full, probe) === lmScores(rebuilt, probe))
  }

  test("LmIndex: append crash window (counters without their ledger twin) " +
      "neither skews reads nor double-counts on replay; a compact in the " +
      "window reconciles the residue instead of folding it") {
    val base = tmp("graft-lmcrash")
    val idx = s"$base/idx"
    LmIndex.buildModel(spark, lmCorpus.filter(col("doc_id") =!= 3L), idx)
    def totals(d: String) = LmIndex.pairTotals(spark, d)
      .collect().map(_.toSeq).toSet
    val before = totals(idx)
    val batch = lmCorpus.filter(col("doc_id") === 3L)
    LmIndex.appendToModel(spark, idx, batch)
    // simulate the crash BETWEEN the counter renames and the ledger
    // rename: pairs/prefix epoch=1 committed, docs epoch=1 absent
    for (t <- Seq("docs")) {
      val p = new org.apache.hadoop.fs.Path(s"$idx/$t.parquet/epoch=1")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    // reads skip the uncommitted residue
    assert(totals(idx) === before)
    // a compact in the window must NOT fold the residue into epoch=0
    LmIndex.compact(spark, idx)
    assert(totals(idx) === before)
    // the replayed batch lands exactly once
    LmIndex.appendToModel(spark, idx, batch)
    val oneShot = s"$base/oneshot"
    LmIndex.buildModel(spark, lmCorpus, oneShot)
    assert(totals(idx) === totals(oneShot))
  }

  // --- ClassifyIndex -------------------------------------------------------

  test("ClassifyIndex: delete nets the victim's train counts out, parity with rebuild") {
    val base = tmp("graft-clfdel")
    // ClassifyOps train/holdout split is doc_id-hash based; use the real
    // fixture corpus so both splits are populated
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val victims = docs.filter(col("doc_id") < 50L)
    val full = s"$base/full"
    ClassifyIndex.buildModel(spark, docs, full)
    val rebuilt = s"$base/rebuilt"
    ClassifyIndex.buildModel(spark, docs.filter(col("doc_id") >= 50L), rebuilt)
    def counts(d: String) = ClassifyIndex.modelCounts(spark, d)
      .collect().map(_.toSeq).toSet
    ClassifyIndex.deleteFromModel(spark, full, victims)
    assert(counts(full) === counts(rebuilt))
    assert(ClassifyIndex.residentDocIds(spark, full)
      .filter(col("doc_id") < 50L).count() === 0L)
    ClassifyIndex.compact(spark, full)
    assert(counts(full) === counts(rebuilt))
    assert(!new java.io.File(s"$full/dels.parquet").exists())
    // scoring parity end to end on the surviving store
    val probe = docs.filter(col("doc_id") >= 50L)
    val a = ClassifyIndex.scoreDocs(spark, probe, full).collect().map(_.toSeq).toSet
    val b = ClassifyIndex.scoreDocs(spark, probe, rebuilt).collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  // --- DsirIndex ------------------------------------------------------------

  test("DsirIndex: delete nets the victim's bucket counters out, parity with rebuild") {
    val base = tmp("graft-dsirdel")
    val docs = Seq(
      (1L, "alpha beta alpha", "en"),
      (2L, "gamma delta", "de"),
      (3L, "alpha gamma", "en")).toDF("doc_id", "text", "lang")
    val full = s"$base/full"
    DsirIndex.buildIndex(spark, docs, full)
    val rebuilt = s"$base/rebuilt"
    DsirIndex.buildIndex(spark, docs.filter(col("doc_id") =!= 3L), rebuilt)
    def totals(d: String) = DsirIndex.bucketTotals(spark, d)
      .collect().map(_.toSeq).toSet
    DsirIndex.deleteFromIndex(spark, full, docs.filter(col("doc_id") === 3L))
    assert(totals(full) === totals(rebuilt))
    // served votes match the never-saw-it store
    val probe = Seq((10L, "alpha gamma")).toDF("doc_id", "text")
    def score(d: String) = DsirIndex.scoreDocs(spark, probe, d)
      .collect().map(_.toSeq).toSet
    assert(score(full) === score(rebuilt))
    // shadowed re-append, then the durable apply, then normal re-insert
    DsirIndex.appendToIndex(spark, full, docs.filter(col("doc_id") === 3L))
    assert(totals(full) === totals(rebuilt))
    DsirIndex.compact(spark, full)
    assert(totals(full) === totals(rebuilt))
    assert(!new java.io.File(s"$full/dels.parquet").exists())
    DsirIndex.appendToIndex(spark, full, docs.filter(col("doc_id") === 3L))
    val restored = s"$base/restored"
    DsirIndex.buildIndex(spark, docs, restored)
    assert(totals(full) === totals(restored))
  }
}
