package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The round-8 policy layer: a long-lived maintenance stream must
  * SELF-compact — epoch counts bounded by the threshold forever, reads
  * identical through every fold — with no operator in the loop. */
class IndexPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def epochsOf(dir: String, table: String): Set[String] = {
    val f = new java.io.File(s"$dir/$table")
    if (!f.isDirectory) Set.empty
    else f.listFiles().map(_.getName).filter(_.startsWith("epoch=")).toSet
  }

  test("maybeCompact triggers at the threshold and only then") {
    val dir = tmpDir("graft-policy-unit")
    val docs = (1L to 50L).map(i => (i, "s0", 100L + i)).toDF("doc_id", "source", "n_chars")
    SketchIndex.buildIndex(spark, docs.filter(col("doc_id") <= 10), dir)
    SketchIndex.appendToIndex(spark, dir, docs.filter(col("doc_id") > 10 && col("doc_id") <= 20))
    var ran = 0
    // below threshold: no trigger
    assert(!IndexPolicy.maybeCompact(spark, s"$dir/sample.parquet", every = 3) { ran += 1 })
    assert(ran === 0)
    SketchIndex.appendToIndex(spark, dir, docs.filter(col("doc_id") > 20))
    // at threshold: trigger fires
    assert(IndexPolicy.maybeCompact(spark, s"$dir/sample.parquet", every = 3) {
      ran += 1
      SketchIndex.compact(spark, dir)
    })
    assert(ran === 1)
    assert(epochsOf(dir, "sample.parquet") === Set("epoch=0"))
    // disabled: never fires
    assert(!IndexPolicy.maybeCompact(spark, s"$dir/sample.parquet", every = 0) { ran += 1 })
    assert(ran === 1)
  }

  test("pending deletions force the next maybeCompact even below the epoch " +
      "threshold — the takedown read-tax window is one maintenance cycle") {
    val dir = tmpDir("graft-policy-del") + "/idx"
    val docs = Seq(
      (1L, "hit f1 f2 f3"), (2L, "hit hit f1 f2"), (3L, "x y z"))
      .toDF("doc_id", "text")
    SearchIndex.buildIndex(spark, docs, dir)
    // one epoch, no deletions: no trigger
    var ran = 0
    assert(!IndexPolicy.maybeCompact(spark, s"$dir/postings.parquet", every = 16) { ran += 1 })
    assert(!IndexPolicy.pendingDeletes(spark, dir))
    // a takedown lands: tombstones pending forces the compact NOW
    SearchIndex.deleteFromIndex(spark, dir, Seq(2L).toDF("doc_id"))
    assert(IndexPolicy.pendingDeletes(spark, dir))
    assert(IndexPolicy.maybeCompact(spark, s"$dir/postings.parquet", every = 16) {
      ran += 1
      SearchIndex.compact(spark, dir)
    })
    assert(ran === 1)
    assert(!IndexPolicy.pendingDeletes(spark, dir),
      "the forced compact must retire the pending deletion")
    // retired: the next cycle is quiet again
    assert(!IndexPolicy.maybeCompact(spark, s"$dir/postings.parquet", every = 16) { ran += 1 })
    assert(ran === 1)
    // count families: the dels ledger forces it the same way
    val lm = tmpDir("graft-policy-dels") + "/lm"
    LmIndex.buildModel(spark, docs, lm)
    LmIndex.deleteFromModel(spark, lm, docs.filter(col("doc_id") === 3L))
    assert(IndexPolicy.pendingDeletes(spark, lm))
    assert(IndexPolicy.maybeCompact(spark, s"$lm/pairs.parquet", every = 16) {
      LmIndex.compact(spark, lm)
    })
    assert(!IndexPolicy.pendingDeletes(spark, lm))
  }

  test("a long maintenance stream self-compacts and keeps serving exact reads") {
    implicit val sql = spark.sqlContext
    val indexDir = tmpDir("graft-policy-stream") + "/i"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, Long)]
    val every = 4
    val q = graft.streaming.DocStream.sketchMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "source", "n_chars"), indexDir,
      compactEvery = every)
    val all = (1L to 120L).map(i => (i, if (i % 3 == 0) "s1" else "s0", 50L + i))
    try {
      all.grouped(10).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        // the published epoch count never exceeds the threshold: the
        // trigger folds the store back to one epoch whenever it reaches it
        assert(epochsOf(indexDir, "sample.parquet").size <= every,
          s"epochs ${epochsOf(indexDir, "sample.parquet")}")
      }
    } finally q.stop()
    // at least one compaction actually happened over 12 appends
    assert(epochsOf(indexDir, "sample.parquet").size < 12)
    // and the self-compacted store serves EXACTLY the one-shot build
    val batchDir = tmpDir("graft-policy-batch") + "/i"
    SketchIndex.buildIndex(spark,
      all.toDF("doc_id", "source", "n_chars"), batchDir)
    def ests(d: String) = SketchIndex.estimatesFromIndex(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(ests(indexDir) === ests(batchDir))
  }

  test("IndexCatalog reports family, epochs, rows and drift") {
    val dir = tmpDir("graft-policy-catalog")
    val docs = (1L to 40L).map(i => (i, "s0", 100L + i)).toDF("doc_id", "source", "n_chars")
    SketchIndex.buildIndex(spark, docs.filter(col("doc_id") <= 20), dir)
    SketchIndex.appendToIndex(spark, dir, docs.filter(col("doc_id") > 20))
    val r = graft.IndexCatalog.report(spark, dir)
    assert(r.family === "sketch")
    val sample = r.tables.find(_.name == "sample.parquet").get
    assert(sample.epochs === 2)
    assert(sample.rows === 40L)
    val docsT = r.tables.find(_.name == "docs.parquet").get
    assert(docsT.rows === 40L)
    assert(r.drift.isEmpty)
    assert(graft.IndexCatalog.render(r).nonEmpty)

    // ivf store gets a drift row
    val emb = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val ivfDir = tmpDir("graft-policy-catalog-ivf") + "/idx"
    val cents = SimilarityOps.learnedCentRows(spark, "/root/testdata/sf0.001")
    IvfIndex.buildIndex(spark, ivfDir, cents, emb.filter(col("vec_id") % 2 === 0))
    IvfIndex.appendToIndex(spark, ivfDir, emb.filter(col("vec_id") % 2 === 1))
    val ri = graft.IndexCatalog.report(spark, ivfDir)
    assert(ri.family === "ivf")
    assert(ri.drift.isDefined)
    assert(ri.drift.get.appendedRows > 0)
    // pending deletions are inspectable: a tombstoned store's catalog row
    // shows the tombstone table with its id count, and it disappears
    // after the durable compact
    IvfIndex.deleteFromIndex(spark, ivfDir, Seq(2L, 4L).toDF("vec_id"))
    val rt = graft.IndexCatalog.report(spark, ivfDir)
    val ts = rt.tables.find(_.name == "tombstones.parquet")
    assert(ts.isDefined && ts.get.rows === 2L,
      "catalog must surface pending deletions")
    assert(rt.pendingDeletes === Some(2L))
    // a REPLAYED delete before the compact (two tombstone epochs carrying
    // the same key) is still ONE pending deletion — keys, not rows
    IvfIndex.deleteFromIndex(spark, ivfDir, Seq(2L).toDF("vec_id"))
    assert(graft.IndexCatalog.report(spark, ivfDir).pendingDeletes === Some(2L))
    assert(graft.IndexCatalog.render(rt).exists(_.contains("PENDING DELETES")))
    IvfIndex.compact(spark, ivfDir)
    val rc = graft.IndexCatalog.report(spark, ivfDir)
    assert(!rc.tables.exists(_.name == "tombstones.parquet"))
    assert(rc.pendingDeletes.isEmpty)
  }

  test("IndexCatalog surfaces NegEpochs pending deletions (count families)") {
    val dir = tmpDir("graft-policy-catalog-lm") + "/lm"
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    LmIndex.buildModel(spark, docs, dir)
    LmIndex.deleteFromModel(spark, dir, docs.filter(col("doc_id") === 2L))
    val r = graft.IndexCatalog.report(spark, dir)
    assert(r.family === "lm-bigram")
    assert(r.pendingDeletes === Some(1L))
    assert(graft.IndexCatalog.render(r).exists(_.contains("PENDING DELETES")))
    LmIndex.compact(spark, dir)
    assert(graft.IndexCatalog.report(spark, dir).pendingDeletes.isEmpty)
  }
}
