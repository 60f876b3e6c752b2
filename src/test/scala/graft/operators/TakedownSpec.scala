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

  test("id-only requests resolve against the corpus; unresolvable ids are " +
      "reported per count-model store, never silently subtracted as nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-idonly").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    LmIndex.buildModel(spark, docs, s"$base/lm")
    ClassifyIndex.buildModel(spark,
      docs.select("doc_id", "lang", "text"), s"$base/clf")
    DsirIndex.buildIndex(spark, docs, s"$base/dsir")
    SpanIndex.buildIndex(spark, docs.select("doc_id", "text"), s"$base/span")
    SearchIndex.buildIndex(spark, docs, s"$base/search")
    val dirs = Seq(s"$base/lm", s"$base/clf", s"$base/dsir",
      s"$base/span", s"$base/search")

    // id-only with NO corpus: refused loudly (the count models cannot
    // reverse their arithmetic from an id)
    val bare = Seq(2L).toDF("doc_id")
    val noCorpus = intercept[IllegalArgumentException] {
      Takedown.sweep(spark, bare, dirs)
    }
    assert(noCorpus.getMessage.contains("corpus"))
    // …but ONLY when a count-model store is actually swept: doc/vector-
    // keyed stores delete by id alone, so an id-only sweep over them
    // needs no corpus at all
    val idOnly = Takedown.sweep(spark, Seq(3L).toDF("doc_id"),
      Seq(s"$base/search"))
    assert(idOnly.map(r => r.family -> r.action) === Seq("search" -> "deleted"))
    assert(SearchIndex.searchFromIndex(spark, s"$base/search", Seq("alpha"), 10)
      .filter(col("doc_id") === 3L).count() === 0L)

    // id-only WITH corpus: full deletion — rebuild bit-parity everywhere
    val results = Takedown.sweep(spark, bare, dirs, corpus = Some(docs))
    assert(results.map(r => r.family -> r.action).toMap === Map(
      "lm-bigram" -> "deleted", "classifier" -> "deleted",
      "dsir" -> "deleted", "span" -> "deleted", "search" -> "deleted"))
    assert(results.forall(_.unresolved === 0L))
    val survivors = docs.filter(col("doc_id") =!= 2L)
    LmIndex.buildModel(spark, survivors, s"$base/lm-rebuilt")
    val probe = Seq((9L, "alpha beta delta gamma")).toDF("doc_id", "text")
    assert(LmIndex.scoreDocs(spark, probe, s"$base/lm").collect().map(_.toSeq).toSet
      === LmIndex.scoreDocs(spark, probe, s"$base/lm-rebuilt").collect().map(_.toSeq).toSet)
    ClassifyIndex.buildModel(spark,
      survivors.select("doc_id", "lang", "text"), s"$base/clf-rebuilt")
    assert(ClassifyIndex.modelCounts(spark, s"$base/clf").collect().map(_.toSeq).toSet
      === ClassifyIndex.modelCounts(spark, s"$base/clf-rebuilt").collect().map(_.toSeq).toSet)
    DsirIndex.buildIndex(spark, survivors, s"$base/dsir-rebuilt")
    assert(DsirIndex.bucketTotals(spark, s"$base/dsir").collect().map(_.toSeq).toSet
      === DsirIndex.bucketTotals(spark, s"$base/dsir-rebuilt").collect().map(_.toSeq).toSet)
    assert(SpanIndex.residentDocIds(spark, s"$base/span")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(SearchIndex.searchFromIndex(spark, s"$base/search", Seq("gamma"), 10)
      .filter(col("doc_id") === 2L).count() === 0L)

    // an id the corpus does NOT hold: resident in the count models but
    // unresolvable — reported as a hole per store, while the doc-keyed
    // store still deletes it by id
    val ghostDocs = docs.unionByName(
      Seq((9L, "rho sigma tau", "en", "s2")).toDF("doc_id", "text", "lang", "source"))
    LmIndex.buildModel(spark, ghostDocs, s"$base/lm2")
    SearchIndex.buildIndex(spark, ghostDocs, s"$base/search2")
    val holes = Takedown.sweep(spark, Seq(9L).toDF("doc_id"),
      Seq(s"$base/lm2", s"$base/search2"), corpus = Some(docs))
    val byFam = holes.map(r => r.family -> r).toMap
    assert(byFam("lm-bigram").unresolved === 1L,
      "the count model must report the unresolvable resident id")
    assert(byFam("search").action === "deleted")
    assert(byFam("search").unresolved === 0L)
    assert(SearchIndex.searchFromIndex(spark, s"$base/search2", Seq("rho"), 10)
      .filter(col("doc_id") === 9L).count() === 0L)
    // the already-resolved-and-deleted id replayed as id-only: NOT a
    // hole (gone from the resident ledger), the standard replay no-op
    val replay = Takedown.sweep(spark, bare, Seq(s"$base/lm"), corpus = Some(docs))
    assert(replay.head.unresolved === 0L)
  }

  test("a broken store's delete is isolated to an error row — every other " +
      "store still sweeps — and the audit ledger records each attempt, " +
      "including the failed one") {
    val base = java.nio.file.Files.createTempDirectory("graft-tderr").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    SearchIndex.buildIndex(spark, docs, s"$base/search")
    LmIndex.buildModel(spark, docs, s"$base/lm")
    DsirIndex.buildIndex(spark, docs, s"$base/dsir")
    // corrupt the search store: its resident-ledger read will throw
    val dp = new org.apache.hadoop.fs.Path(s"$base/search/docs.parquet")
    dp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dp, true)

    val victims = docs.filter(col("doc_id") === 2L)
    val dirs = Seq(s"$base/search", s"$base/lm", s"$base/dsir")
    val logDir = s"$base/audit"
    val ex = intercept[Takedown.StoreErrorException] {
      Takedown.sweepLogged(spark, "req-1", victims, dirs, logDir)
    }
    val byFam = ex.results.map(r => r.family -> r.action).toMap
    assert(byFam("search").startsWith("error_delete_failed"))
    assert(byFam("lm-bigram") === "deleted" && byFam("dsir") === "deleted",
      "stores AFTER the broken one must still be swept")
    // the healthy stores' deletions really landed
    val rebuilt = s"$base/lm-rebuilt"
    LmIndex.buildModel(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    val probe = Seq((9L, "alpha beta delta gamma")).toDF("doc_id", "text")
    assert(LmIndex.scoreDocs(spark, probe, s"$base/lm").collect().map(_.toSeq).toSet
      === LmIndex.scoreDocs(spark, probe, rebuilt).collect().map(_.toSeq).toSet)
    // the FAILED attempt is in the ledger — the auditor's view of the
    // partial outcome
    val log0 = Takedown.sweepLog(spark, logDir)
    assert(log0.count() === 3L)
    assert(log0.filter(col("request_id") === "req-1")
      .filter(col("action").startsWith("error_delete_failed")).count() === 1L)

    // repair the store, replay the request (at-least-once, idempotent):
    // a clean attempt appends — history is kept, not overwritten
    SearchIndex.buildIndex(spark, docs, s"$base/search")
    val rs = Takedown.sweepLogged(spark, "req-1", victims, dirs, logDir)
    assert(rs.map(_.action).forall(a => a == "deleted" || a == "noop"))
    val log1 = Takedown.sweepLog(spark, logDir)
    assert(log1.count() === 6L)
    assert(log1.select(col("attempt")).distinct().count() === 2L)
    assert(log1.filter(col("attempt") === 1)
      .filter(col("family") === "search").select(col("action"))
      .head().getString(0) === "deleted")
    assert(log1.select(col("n_victims")).distinct().head().getLong(0) === 1L)
  }

  test("a failed audit-ledger write cannot mask the sweep's outcome: the " +
      "deletions stay applied and AuditLogException carries the report") {
    val base = java.nio.file.Files.createTempDirectory("graft-tdlog").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    SearchIndex.buildIndex(spark, docs, s"$base/search")
    // an unwritable ledger: the logDir's parent is a FILE
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/blocked"),
      "x".getBytes)
    val ex = intercept[Takedown.AuditLogException] {
      Takedown.sweepLogged(spark, "req-9", docs.filter(col("doc_id") === 2L),
        Seq(s"$base/search"), s"$base/blocked/audit")
    }
    assert(ex.results.map(r => r.family -> r.action) === Seq("search" -> "deleted"))
    // the deletion really applied despite the ledger failure
    assert(SearchIndex.searchFromIndex(spark, s"$base/search", Seq("gamma"), 10)
      .filter(col("doc_id") === 2L).count() === 0L)
  }

  test("takedownStream resolves id-only requests against corpusDir as of " +
      "each trigger") {
    val base = java.nio.file.Files.createTempDirectory("graft-tdid").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    docs.write.parquet(s"$base/corpus")
    LmIndex.buildModel(spark, docs, s"$base/lm")
    SearchIndex.buildIndex(spark, docs, s"$base/search")

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Long]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[graft.operators.Takedown.StoreResult]
    val q = graft.streaming.DocStream.takedownStream(
      spark, input.toDF().toDF("doc_id"),
      Seq(s"$base/lm", s"$base/search"),
      corpusDir = Some(s"$base/corpus"),
      logDir = Some(s"$base/audit")) { rs => reports ++= rs; () }
    try {
      input.addData(2L)
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(r => r.family -> r.action).toList ===
      List("lm-bigram" -> "deleted", "search" -> "deleted"))
    assert(reports.forall(_.unresolved === 0L))
    // the streaming lane's audit ledger: one attempt, victim-derived id
    val log = graft.operators.Takedown.sweepLog(spark, s"$base/audit")
    assert(log.count() === 2L)
    assert(log.select(col("request_id")).distinct().head().getString(0)
      === "ids:2")
    val rebuilt = s"$base/lm-rebuilt"
    LmIndex.buildModel(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    val probe = Seq((9L, "alpha beta delta gamma")).toDF("doc_id", "text")
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
