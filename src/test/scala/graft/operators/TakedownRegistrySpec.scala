package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The ONE store-signature registry ([[graft.IndexCatalog.Families]]):
  * [[Takedown.sweep]] and [[graft.IndexCatalog.report]] must agree on
  * every persisted family — a family present in one map but not the
  * other is the silently-missed-store failure the compliance sweep
  * exists to prevent. Builds a real store of EVERY family plus a
  * deliberately-unknown dir, and pins that `unknown` is a reported
  * ERROR (strict sweeps throw AFTER applying the known stores'
  * deletions), never a quiet skip. */
class TakedownRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sweep and catalog detect the same family for every store; " +
      "unknown is an error, not a skip") {
    val base = java.nio.file.Files.createTempDirectory("graft-registry").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "s0"),
      (2L, "gamma delta epsilon zeta", "de", "s0"),
      (3L, "alpha beta beta delta", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val emb = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

    SearchIndex.buildIndex(spark, docs, s"$base/search")
    EvalIndex.buildIndex(spark, docs, s"$base/eval")
    LmIndex.buildModel(spark, docs, s"$base/lm")
    DsirIndex.buildIndex(spark, docs, s"$base/dsir")
    PackIndex.buildIndex(spark, docs.select("doc_id", "source", "text"), s"$base/pack")
    TokenizerIndex.buildIndex(spark, docs.select("doc_id", "text"), s"$base/tok")
    ClassifyIndex.buildModel(spark, docs.select("doc_id", "lang", "text"), s"$base/clf")
    SpanIndex.buildIndex(spark, docs.select("doc_id", "text"), s"$base/span")
    SketchIndex.buildIndex(spark,
      docs.select("doc_id", "source", "n_chars"), s"$base/sketch")
    WinnowIndex.buildIndex(spark, docs.select("doc_id", "text"), s"$base/winnow")
    IncrementalDedup.buildIndex(docs.select("doc_id", "text"), s"$base/incdedup")
    ClusterIndex.buildIndex(docs.select("doc_id", "text"), s"$base/cluster")
    IvfIndex.buildIndex(spark, s"$base/ivf",
      Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0)),
      Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
        (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    PqIndex.buildIndex(spark, emb, s"$base/pq")
    AnnIndex.buildIndex(spark, emb, s"$base/lsh")
    // the 16th family: the pseudo-label output store, built by its real
    // writer (the stream's batch body against the sf0.001 corpus store)
    graft.streaming.DocStream.processPseudoLabelBatch(
      spark, "/root/testdata/sf0.001", s"$base/pseudo",
      emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    // the 17th: the drift monitor's share baseline, via its real writer
    DriftMonitor.writeBaseline(spark, docs, s"$base/drift")
    // the deliberately-unknown store: a table no family signs
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$base/mystery/stuff.parquet")

    val dirs = Seq("search", "eval", "lm", "dsir", "pack", "tok", "clf",
      "span", "sketch", "winnow", "incdedup", "cluster", "ivf", "pq", "lsh",
      "pseudo", "drift", "mystery").map(d => s"$base/$d")
    val victims = docs.filter(col("doc_id") === 2L)

    // non-strict sweep: full report, error row for the unknown dir
    val results = Takedown.sweep(spark, victims, dirs, failOnUnknown = false)
    // sweep and catalog agree on EVERY dir (same registry by construction;
    // this pins it against a future re-fork of the map)
    for (r <- results)
      assert(r.family === graft.IndexCatalog.report(spark, r.dir).family,
        s"sweep and catalog disagree on ${r.dir}")
    // all seventeen families detected distinctly, none fell through
    val byFamily = results.map(r => r.family -> r.action).toMap
    assert(results.map(_.family).distinct.size === results.size)
    assert(byFamily.keySet === Set("search", "eval-vocab", "lm-bigram",
      "dsir", "pack", "tokenizer", "classifier", "span", "sketch", "winnow",
      "incremental-dedup", "cluster", "ivf", "pq", "ann-lsh", "pseudo-labels",
      "drift-baseline", "unknown"))
    assert(byFamily("unknown") === "error_unknown_family")
    assert(byFamily("tokenizer") === "retrain_required")
    assert(byFamily("drift-baseline") === "retrain_required",
      "per-mille shares cannot un-count one document — re-baseline")
    assert((byFamily - "unknown" - "tokenizer" - "drift-baseline")
      .values.toSet === Set("deleted"))

    // strict sweep (the default): throws, but ONLY AFTER applying the
    // known stores — one unidentifiable dir must not block the other
    // families' deletions, and the exception carries the full report
    val ex = intercept[Takedown.UnknownStoreException] {
      Takedown.sweep(spark, victims, Seq(s"$base/search", s"$base/mystery"))
    }
    assert(ex.results.map(_.action) === Seq("noop", "error_unknown_family"))
    assert(ex.getMessage.contains("mystery"))

    // the streaming lane reports the error row FIRST, then fails loudly
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, String, String)]
    val reports = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = graft.streaming.DocStream.takedownStream(
      spark, input.toDF().toDF("doc_id", "text", "lang", "source"),
      Seq(s"$base/lm", s"$base/mystery")) { rs =>
      reports ++= rs.map(r => r.family -> r.action); ()
    }
    try {
      input.addData((2L, "gamma delta epsilon zeta", "de", "s0"))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("mystery"))
    } finally q.stop()
    assert(reports.toList === List(
      "lm-bigram" -> "deleted", "unknown" -> "error_unknown_family"))
  }

  test("one registry row carries (signature, family, discipline, compact): " +
      "every pending-state discipline has its retiring compact, the " +
      "no-pending disciplines carry none, and signatures are unique") {
    import graft.IndexCatalog.{Discipline, Families}
    for (f <- Families) f.discipline match {
      case Discipline.TombstoneVec(_) | Discipline.TombstoneDoc(_) |
          Discipline.Count(_, _) =>
        assert(f.compact.isDefined,
          s"${f.name} leaves pending deletion state but registers no " +
            "deletion-applying compact — applyNow/repair could never retire it")
      case Discipline.Rewrite(_) | Discipline.Retrain =>
        assert(f.compact.isEmpty,
          s"${f.name} leaves no pending state; a registered compact here " +
            "would run a whole-store rewrite for nothing")
    }
    assert(Families.map(_.signature).distinct.size === Families.size,
      "two rows claiming one signature table would shadow each other")
    assert(Families.forall(_.requiredTables.nonEmpty),
      "every family must declare its serving-surface minimum — the fsck " +
        "missing-table check reads the registry row")
    // a store of a NEW family (unregistered signature) fails at the
    // REGISTRY level — detection returns no row, so there is no
    // discipline or handler to half-run; the sweep reports it as
    // error_unknown_family before any family-specific code touches it
    assert(graft.IndexCatalog.detectFamilyDef(Seq("novel.parquet")).isEmpty)
    // and the count-family resolution set is the registry's discipline
    // column, not a hand-maintained twin: exactly the Count rows
    val countNames = Families
      .filter(_.discipline.isInstanceOf[Discipline.Count]).map(_.name).toSet
    assert(countNames === Set("lm-bigram", "classifier", "dsir", "span", "sketch"))
  }
}
