package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted inverted index ([[SearchIndex]]): indexed ≡ inline,
  * append ≡ rebuild, replay/compaction invariance, and the pruned-read
  * contract (a keyword query touches only its terms' buckets). */
class SearchIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("indexed keyword lane ≡ inline lane on the sf0.001 corpus") {
    val a = QueryRegistry.byName("q_keyword_search").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_keyword_search_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("indexed hybrid lane ≡ inline lane on the sf0.001 corpus") {
    val a = QueryRegistry.byName("q_hybrid_search").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_hybrid_search_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("indexed BM25 lane ≡ inline lane on the sf0.001 corpus") {
    val a = graft.QueryRegistry.byName("q_bm25_search").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = graft.QueryRegistry.byName("q_bm25_search_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("BM25 semantics: tf saturates sublinearly and longer docs score lower") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-bm25").toString + "/idx"
    // same filler-length docs with tf(hit) = 1, 2, 4; plus a long doc
    // with the same tf as doc 2 (its extra length must cost it score)
    SearchIndex.buildIndex(spark, Seq(
      (1L, "hit f1 f2 f3"),
      (2L, "hit hit f1 f2"),
      (3L, "hit hit hit hit"),
      (4L, "hit hit f1 f2 f3 f4 f5 f6 f7 f8 f9 f10")).toDF("doc_id", "text"), idx)
    val s = SearchIndex.bm25FromIndex(spark, idx, Seq("hit"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(3L) > s(2L) && s(2L) > s(1L), "score increases with tf")
    // saturation: tf 1→2 gains more than tf 2→4 (equal lengths)
    assert(s(2L) - s(1L) > s(3L) - s(2L), "tf gain must saturate")
    assert(s(4L) < s(2L), "longer doc, same tf, must score lower")
  }

  test("BM25 tombstone parity: a deleted doc's scores match a rebuild without it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bm25del").toString
    val docs = Seq(
      (1L, "hit f1 f2 f3"), (2L, "hit hit f1 f2"),
      (3L, "hit hit hit hit"), (4L, "noise only here")).toDF("doc_id", "text")
    val full = s"$base/full"
    SearchIndex.buildIndex(spark, docs, full)
    SearchIndex.deleteFromIndex(spark, full, Seq(2L).toDF("doc_id"))
    val rebuilt = s"$base/rebuilt"
    SearchIndex.buildIndex(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    def scores(d: String) = SearchIndex.bm25FromIndex(spark, d, Seq("hit"), 10)
      .collect().map(_.toSeq).toSet
    // df, n_docs, t_tokens and avgdl all shrink through the tombstone —
    // bit-parity with the store that never saw the doc
    assert(scores(full) === scores(rebuilt))
    SearchIndex.compact(spark, full)
    assert(scores(full) === scores(rebuilt))
  }

  test("persisted term_df summary ≡ read-derived df across append, crash-" +
      "window replay, deletion, and compact — and it backfills on legacy stores") {
    val base = java.nio.file.Files.createTempDirectory("graft-termdf").toString
    val idx = s"$base/idx"
    val b1 = corpus((1L, "hit f1 f2 f3"), (2L, "hit hit f1 f2"))
    val b2 = corpus((3L, "hit hit hit hit"), (4L, "noise only here"))
    def summary() = SearchIndex.termDfFromStore(spark, idx).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def derived() = spark.read.parquet(s"$idx/postings.parquet")
      .groupBy(col("doc_id"), col("term")).agg(min(col("tf")).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    SearchIndex.buildIndex(spark, b1, idx)
    assert(summary() === derived())
    SearchIndex.appendToIndex(spark, idx, b2)
    assert(summary() === derived())

    // crash window: postings + term_df epochs published, docs rename lost
    // — the orphaned term_df epoch must NOT double its batch's df once
    // the at-least-once replay lands the same batch under the next number
    val docsE = new org.apache.hadoop.fs.Path(s"$idx/docs.parquet/epoch=1")
    docsE.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(docsE, true)
    SearchIndex.appendToIndex(spark, idx, b2)
    assert(summary() === derived(),
      "an orphaned term_df epoch must be excluded, not double-counted")

    SearchIndex.compact(spark, idx)
    assert(summary() === derived())
    assert(new java.io.File(s"$idx/term_df.parquet/epoch=0").exists())

    // deletion: while pending the serving path falls back (df must
    // exclude the victim); the applying compact refolds the summary
    SearchIndex.deleteFromIndex(spark, idx, Seq(2L).toDF("doc_id"))
    SearchIndex.compact(spark, idx)
    assert(summary() === derived())
    assert(summary()("f1") === 1L, "the victim's contribution to df must be gone")

    // legacy store (no summary table): reads fall back, the first
    // compact backfills it
    val legacy = s"$base/legacy"
    SearchIndex.buildIndex(spark, b1, legacy)
    val td = new org.apache.hadoop.fs.Path(s"$legacy/term_df.parquet")
    td.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(td, true)
    assert(SearchIndex.termDfFromStore(spark, legacy).isEmpty)
    // an append CREATES the table but covers only the new epoch — a
    // PARTIAL summary must NOT serve (it would drop every old-epoch term
    // from the cap table); still the fallback until the compact backfills
    SearchIndex.appendToIndex(spark, legacy, b2)
    assert(new java.io.File(s"$legacy/term_df.parquet").exists())
    assert(SearchIndex.termDfFromStore(spark, legacy).isEmpty,
      "a summary not covering every committed epoch must not serve")
    SearchIndex.compact(spark, legacy)
    val backfilled = SearchIndex.termDfFromStore(spark, legacy)
    assert(backfilled.nonEmpty)
    assert(backfilled.get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === spark.read.parquet(s"$legacy/postings.parquet")
        .groupBy(col("doc_id"), col("term")).agg(min(col("tf")).as("tf"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("a v1 (dl-less) docs ledger is refused by BM25 reads and migrated on " +
      "append/compact with dl recomputed from postings — migrated ≡ rebuilt") {
    val base = java.nio.file.Files.createTempDirectory("graft-bm25v1").toString
    val b1 = corpus((1L, "hit f1 f2 f3"), (2L, "hit hit f1 f2"))
    val b2 = corpus((3L, "hit hit hit hit"),
      (4L, "hit hit f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"))
    // downgrade: rewrite every docs epoch without the dl column (what v1
    // code persisted)
    def downgrade(idx: String): Unit = {
      val docsT = s"$idx/docs.parquet"
      for (e <- new java.io.File(docsT).listFiles().map(_.getName)
          .filter(_.startsWith("epoch="))) {
        val ids = spark.read.parquet(s"$docsT/$e")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        AtomicPublish.stageAndRename(spark, docsT, s".$e-v1.tmp", e) { tmp =>
          ids.toDF("doc_id").write.mode("overwrite").parquet(tmp.toString)
        }
      }
    }
    def bm25(idx: String) = SearchIndex.bm25FromIndex(spark, idx, Seq("hit"), 10)
      .collect().map(_.toSeq).toSet

    val ref = s"$base/ref"
    SearchIndex.buildIndex(spark, b1.unionByName(b2), ref)

    // append path: v1 store + append → whole ledger is v2 afterwards
    val idx = s"$base/idx"
    SearchIndex.buildIndex(spark, b1, idx)
    downgrade(idx)
    val ex = intercept[IllegalStateException](bm25(idx))
    assert(ex.getMessage.contains("migrateDocsLedger"))
    SearchIndex.appendToIndex(spark, idx, b2)
    for (e <- new java.io.File(s"$idx/docs.parquet").listFiles().map(_.getName)
        .filter(_.startsWith("epoch=")))
      assert(spark.read.parquet(s"$idx/docs.parquet/$e").columns.contains("dl"),
        s"docs $e must carry dl after the migrating append")
    assert(bm25(idx) === bm25(ref))

    // compact path: multi-epoch v1 store compacts straight to a clean v2
    val idx2 = s"$base/idx2"
    SearchIndex.buildIndex(spark, b1, idx2)
    SearchIndex.appendToIndex(spark, idx2, b2)
    downgrade(idx2)
    SearchIndex.compact(spark, idx2)
    assert(bm25(idx2) === bm25(ref))
  }

  test("append ≡ rebuild; duplicate-epoch replay and compaction are invariant") {
    val base = java.nio.file.Files.createTempDirectory("graft-searchidx").toString
    val all = corpus(
      (1L, "spark window merge fast"),
      (2L, "spark spark table scan"),
      (3L, "window row group sort"),
      (4L, "merge join spark window"))
    val terms = Seq("spark", "window", "merge")

    val oneShot = s"$base/oneshot"
    SearchIndex.buildIndex(spark, all, oneShot)
    val want = SearchIndex.searchFromIndex(spark, oneShot, terms, 10)
      .collect().map(_.toSeq).toSet

    val inc = s"$base/incremental"
    SearchIndex.buildIndex(spark, all.filter(col("doc_id") <= 2L), inc)
    SearchIndex.appendToIndex(spark, inc, all.filter(col("doc_id") > 2L))
    def got() = SearchIndex.searchFromIndex(spark, inc, terms, 10)
      .collect().map(_.toSeq).toSet
    assert(got() === want, "append must equal the one-shot rebuild")

    // crash-window duplicate: the same batch lands twice as two epochs —
    // the read-merge dedupes (doc_id, term), scores unchanged...
    SearchIndex.appendToIndex(spark, inc, all.filter(col("doc_id") > 2L))
    // ...except n_docs derives from the ledger, which must also dedupe
    assert(SearchIndex.residentDocIds(spark, inc).count() === 4L)
    assert(got() === want, "duplicated epoch must not change scores")

    // compaction folds epochs to one and serves the same rows
    SearchIndex.compact(spark, inc)
    val epochs = new java.io.File(s"$inc/postings.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    assert(epochs === 1)
    assert(got() === want, "compaction must be read-invariant")
  }

  test("pruned read: a keyword query touches only the query terms' buckets") {
    val base = java.nio.file.Files.createTempDirectory("graft-searchprune").toString
    // 40 docs over a wide vocabulary so many tbuckets are occupied
    val docs = corpus((1L to 40L).map(i =>
      (i, s"term$i term${i + 1} term${i + 2} common")): _*)
    val idx = s"$base/idx"
    SearchIndex.buildIndex(spark, docs, idx)
    val allFiles = spark.read.parquet(s"$idx/postings.parquet").inputFiles.length
    val df = SearchIndex.searchFromIndex(spark, idx, Seq("term5"), 10)
    df.collect()
    // the tbucket predicate must land as a PARTITION filter on the
    // postings scan (directory pruning), and the executed scan must have
    // read strictly fewer files than the store holds
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case r: ReusedExchangeExec => scans(r.child)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scans)
    }
    val postingScans = scans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("postings.parquet")))
    assert(postingScans.nonEmpty, "no postings scan in the executed plan")
    assert(postingScans.forall(_.partitionFilters.exists(_.toString.contains("tbucket"))),
      "tbucket must appear as a partition filter on the postings scan")
    val touched = postingScans.map(_.metrics("numFiles").value).max
    assert(touched < allFiles,
      s"single-term read must prune buckets: touched $touched of $allFiles")
  }

  test("tombstone delete: immediate exclusion, score parity with a rebuild, compaction retires") {
    val base = java.nio.file.Files.createTempDirectory("graft-searchdel").toString
    val all = corpus(
      (1L, "spark window merge fast"),
      (2L, "spark spark table scan"),
      (3L, "window row group sort"),
      (4L, "merge join spark window"))
    val idx = s"$base/idx"
    SearchIndex.buildIndex(spark, all, idx)
    val terms = Seq("spark", "window", "merge")
    SearchIndex.deleteFromIndex(spark, idx, Seq(2L).toDF("doc_id"))

    // the deleted doc's postings vanish from results AND from df/n_docs:
    // scores equal a one-shot rebuild over the corpus without the doc
    val rebuilt = s"$base/rebuilt"
    SearchIndex.buildIndex(spark, all.filter(col("doc_id") =!= 2L), rebuilt)
    def rows(d: String) = SearchIndex.searchFromIndex(spark, d, terms, 10)
      .collect().map(_.toSeq).toSet
    assert(rows(idx) === rows(rebuilt),
      "tombstoned store must score exactly like the rebuild without the doc")

    // compaction (forced by pending tombstones even at one epoch) makes
    // it durable, retires the table, and keeps the tbucket layout
    SearchIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    assert(rows(idx) === rows(rebuilt))
    val ep0 = new java.io.File(s"$idx/postings.parquet/epoch=0")
    assert(ep0.listFiles().exists(_.getName.startsWith("tbucket=")),
      "compaction must preserve the term-bucket directory layout")
    // after durability, re-adding the doc is a normal insert
    SearchIndex.appendToIndex(spark, idx, all.filter(col("doc_id") === 2L))
    val full = s"$base/oneshot2"
    SearchIndex.buildIndex(spark, all, full)
    assert(rows(idx) === rows(full))
  }

  test("searchIndexMaintenanceStream wiring folds batches through the query") {
    val base = java.nio.file.Files.createTempDirectory("graft-searchwire").toString
    val idx = s"$base/idx"
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.searchIndexMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "text"), idx)
    try {
      input.addData((1L, "spark window merge"), (2L, "spark table"))
      q.processAllAvailable()
      input.addData((3L, "window merge merge"))
      q.processAllAvailable()
    } finally q.stop()
    assert(SearchIndex.residentDocIds(spark, idx).count() === 3L)
    val hits = SearchIndex.searchFromIndex(spark, idx, Seq("merge"), 10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 3L))
  }

  test("streamed maintenance ≡ one-shot build, with re-delivery absorbed") {
    val base = java.nio.file.Files.createTempDirectory("graft-searchstream").toString
    val idx = s"$base/idx"
    val b1 = corpus((1L, "spark window merge"), (2L, "spark table"))
    val b2 = corpus((3L, "window window merge"), (2L, "spark table")) // 2 re-delivered
    val b3 = corpus((4L, "merge spark spark window"))
    Seq(b1, b2, b3).foreach { b =>
      graft.streaming.DocStream.processSearchIndexBatch(spark, idx, b)
    }
    val oneShot = s"$base/oneshot"
    SearchIndex.buildIndex(spark,
      corpus((1L, "spark window merge"), (2L, "spark table"),
        (3L, "window window merge"), (4L, "merge spark spark window")), oneShot)
    val terms = Seq("spark", "window", "merge")
    val a = SearchIndex.searchFromIndex(spark, idx, terms, 10)
      .collect().map(_.toSeq).toSet
    val b = SearchIndex.searchFromIndex(spark, oneShot, terms, 10)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(SearchIndex.residentDocIds(spark, idx).count() === 4L)
  }
}
