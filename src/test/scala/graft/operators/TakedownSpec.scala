package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** One takedown request fanned across heterogeneous stores
  * ([[Takedown.sweep]]): family detection, per-family input shaping,
  * immediate read-path exclusion, and the honest frozen-model report. */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sweep deletes from every detected store and reports the tokenizer " +
      "as retrain_required") {
    val base = java.nio.file.Files.createTempDirectory("graft-takedown").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

    SearchIndex.buildIndex(spark, docs, s"$base/search")
    EvalIndex.buildIndex(spark, docs, s"$base/eval")
    LmIndex.buildModel(spark, docs, s"$base/lm")
    DsirIndex.buildIndex(spark, docs, s"$base/dsir")
    PackIndex.buildIndex(spark,
      docs.select("doc_id", "source", "text"), s"$base/pack")
    TokenizerIndex.buildIndex(spark,
      docs.select("doc_id", "text"), s"$base/tok")

    val victims = docs.filter(col("doc_id") === 2L)
    val results = Takedown.sweep(spark, victims,
      Seq(s"$base/search", s"$base/eval", s"$base/lm", s"$base/dsir",
        s"$base/pack", s"$base/tok"))
    val byFamily = results.map(r => r.family -> r.action).toMap
    assert(byFamily === Map(
      "search" -> "deleted", "eval-vocab" -> "deleted",
      "lm-bigram" -> "deleted", "dsir" -> "deleted",
      "pack" -> "deleted", "tokenizer" -> "retrain_required"))

    // immediate read-path exclusion, each store's own semantics
    assert(SearchIndex.searchFromIndex(spark, s"$base/search", Seq("gamma"), 10)
      .filter(col("doc_id") === 2L).count() === 0L)
    assert(PackIndex.chunksFromIndex(spark, s"$base/pack")
      .filter(col("doc_id") === 2L).count() === 0L)
    assert(LmIndex.residentDocIds(spark, s"$base/lm")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // the LM counters equal a rebuild that never saw doc 2
    val rebuilt = s"$base/lm-rebuilt"
    LmIndex.buildModel(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    val probe = Seq((9L, "alpha beta delta")).toDF("doc_id", "text")
    assert(LmIndex.scoreDocs(spark, probe, s"$base/lm").collect().map(_.toSeq).toSet
      === LmIndex.scoreDocs(spark, probe, rebuilt).collect().map(_.toSeq).toSet)
    // eval vocabulary keeps only shingles a surviving doc carries
    val survivorsVocab = EvalIndex.shingles(spark, s"$base/eval")
      .collect().map(_.getString(0)).toSet
    val rebuiltVocab = {
      val d2 = s"$base/eval-rebuilt"
      EvalIndex.buildIndex(spark, docs.filter(col("doc_id") =!= 2L), d2)
      EvalIndex.shingles(spark, d2).collect().map(_.getString(0)).toSet
    }
    assert(survivorsVocab === rebuiltVocab)
    // the catalog surfaces the pending state the sweep left behind
    assert(graft.IndexCatalog.report(spark, s"$base/search").pendingDeletes
      === Some(1L))
    assert(graft.IndexCatalog.report(spark, s"$base/lm").pendingDeletes
      === Some(1L))
    // a replayed sweep BEFORE the compact writes no phantom tombstone
    // epoch (the ids are already tombstoned → noop for tombstone
    // families; the count families' victims filter makes theirs no-ops)
    val replay = Takedown.sweep(spark, victims,
      Seq(s"$base/search", s"$base/lm", s"$base/dsir"))
    assert(replay.map(r => r.family -> r.action).toMap ===
      Map("search" -> "noop", "lm-bigram" -> "deleted", "dsir" -> "deleted"))
    assert(graft.IndexCatalog.report(spark, s"$base/search").pendingDeletes
      === Some(1L), "a replayed takedown must not inflate pending count")
    // and AFTER the durable compact a replay is a noop too — no phantom
    // epoch forcing full one-epoch compacts forever
    SearchIndex.compact(spark, s"$base/search")
    val postCompact = Takedown.sweep(spark, victims, Seq(s"$base/search"))
    assert(postCompact.head.action === "noop")
    assert(!new java.io.File(s"$base/search/tombstones.parquet").exists())
    val again = Takedown.sweep(spark, victims, Seq(s"$base/lm", s"$base/dsir"))
    assert(again.forall(_.action == "deleted"))
    assert(LmIndex.scoreDocs(spark, probe, s"$base/lm").collect().map(_.toSeq).toSet
      === LmIndex.scoreDocs(spark, probe, rebuilt).collect().map(_.toSeq).toSet)
  }

  test("takedownStream: requests fan out per micro-batch; a re-delivered " +
      "batch is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft-tdstream").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    SearchIndex.buildIndex(spark, docs, s"$base/search")
    LmIndex.buildModel(spark, docs, s"$base/lm")

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, String, String)]
    val reports = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = graft.streaming.DocStream.takedownStream(
      spark, input.toDF().toDF("doc_id", "text", "lang", "source"),
      Seq(s"$base/search", s"$base/lm")) { rs =>
      reports ++= rs.map(r => r.family -> r.action); ()
    }
    try {
      input.addData((2L, "gamma delta epsilon zeta", "de", "s0"))
      q.processAllAvailable()
      // the re-delivered request (crash-retry window)
      input.addData((2L, "gamma delta epsilon zeta", "de", "s0"))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.toList === List(
      "search" -> "deleted", "lm-bigram" -> "deleted",
      // the replayed batch: already-tombstoned ids are filtered before
      // the tombstone write (noop); the count family's victims filter
      // makes its delete an internal no-op
      "search" -> "noop", "lm-bigram" -> "deleted"))
    // exclusion held; the replayed batch subtracted nothing twice
    assert(SearchIndex.searchFromIndex(spark, s"$base/search", Seq("gamma"), 10)
      .filter(col("doc_id") === 2L).count() === 0L)
    val rebuilt = s"$base/lm-rebuilt"
    LmIndex.buildModel(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    val probe = Seq((9L, "alpha beta delta gamma")).toDF("doc_id", "text")
    assert(LmIndex.scoreDocs(spark, probe, s"$base/lm").collect().map(_.toSeq).toSet
      === LmIndex.scoreDocs(spark, probe, rebuilt).collect().map(_.toSeq).toSet)
  }
}
