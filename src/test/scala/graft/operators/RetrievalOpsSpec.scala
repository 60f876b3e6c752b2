package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Filtered vector search and hybrid RRF fusion ([[RetrievalOps]]):
  * the candidate-stage-filter contract and fusion invariants the
  * oracle's row hash can't articulate. */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("filtered brute: every neighbor satisfies the predicate, ranks dense") {
    val m = QueryRegistry.byName("q_ann_filtered").run(spark, dir).cache()
    try {
      assert(m.filter(col("neighbor_id") % 2 =!= 0).count() === 0)
      // dense 1..5 per query (the predicate keeps >= K candidates here)
      val bad = m.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
        .filter(col("n") =!= 5L || col("mx") =!= 5L)
      assert(bad.count() === 0)
      // and it is EXACT: equals brute force over the filtered corpus —
      // i.e. candidate-stage filtering loses nothing
      val full = QueryRegistry.byName("q_ann_cosine_topk").run(spark, dir)
      // post-filtering the unfiltered top-5 UNDER-FILLS for at least one
      // query (the classic filtered-search bug this lane exists to avoid)
      val postFiltered = full.filter(col("neighbor_id") % 2 === 0)
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      assert(postFiltered.filter(col("n") < 5L).count() > 0,
        "fixture too easy: post-filter equals candidate-stage filter here")
    } finally { m.unpersist(); () }
  }

  test("store-backed filtered probe ≡ inline filtered probe") {
    val a = QueryRegistry.byName("q_ann_filtered_ivf").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_ann_filtered_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("filtered probe results are a subset of the filtered truth's candidates") {
    // every probed result satisfies the predicate and is never a vector
    // the brute lane would rank WORSE than its own kth — probing can
    // miss neighbors (cells unprobed) but never invent or misrank them
    val probe = QueryRegistry.byName("q_ann_filtered_ivf").run(spark, dir).cache()
    try {
      assert(probe.filter(col("neighbor_id") % 2 =!= 0).count() === 0)
      val brute = QueryRegistry.byName("q_ann_filtered").run(spark, dir)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("bc"))
      // per query: probe hits present in brute top-5 must carry the same
      // cosine (same arithmetic) — join and compare
      val joined = probe.join(brute, Seq("query_id", "neighbor_id"))
      assert(joined.filter(abs(col("cosine") - col("bc")) > 1e-12).count() === 0)
    } finally { probe.unpersist(); () }
  }

  test("filtered PQ: predicate holds, store twin ≡ inline, proposals come " +
      "only from the filtered code domain") {
    val a = QueryRegistry.byName("q_ann_filtered_pq").run(spark, dir).cache()
    try {
      assert(a.filter(col("neighbor_id") % 2 =!= 0).count() === 0)
      assert(a.count() > 0)
      val b = QueryRegistry.byName("q_ann_filtered_pq_indexed").run(spark, dir)
        .collect().map(_.toSeq).toSet
      assert(a.collect().map(_.toSeq).toSet === b)
      // the candidate-stage filter is not post-filtering: the unfiltered
      // PQ lane's top-5 post-filtered under-fills for some query
      val full = QueryRegistry.byName("q_ann_pq").run(spark, dir)
      val postFiltered = full.filter(col("neighbor_id") % 2 === 0)
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      assert(postFiltered.filter(col("n") < 5L).count() > 0,
        "fixture too easy: post-filter equals candidate-stage filter here")
    } finally { a.unpersist(); () }
  }

  test("df cap keeps idf ≥ 0 terms and drops the negative-idf stopwords") {
    import spark.implicits._
    // 4 docs: "the" in all 4 (df 4 > 2 — dropped), "data" in 3 (dropped),
    // "half" in exactly 2 (df·2 = n_docs — boundary KEPT, idf = 0),
    // "rare" in 1 (kept)
    val dt = Seq(
      (0L, "the"), (1L, "the"), (2L, "the"), (3L, "the"),
      (0L, "data"), (1L, "data"), (2L, "data"),
      (0L, "half"), (1L, "half"),
      (2L, "rare")).toDF("doc_id", "term")
    val n = Seq(4L).toDF("n_docs")
    val kept = RetrievalOps.dfCapTerms(dt, n)
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("half", "rare"))
  }

  test("df cap parity on a NULL-text corpus: inline n_docs counts " +
      "INDEXABLE docs, matching the postings-store ledger") {
    import spark.implicits._
    // 4 indexable docs + 2 NULL-text docs; term "a" has df 3 —
    // 3·2 = 6 > 4 (dropped against the indexable count) but 6 ≤ 6
    // (kept against a raw COUNT(*)), so the two definitions diverge
    // exactly here and the lanes would drift without the fix
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "b c"),
      (5L, null: String), (6L, null: String)).toDF("doc_id", "text")
    val dt0 = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), " "))).as("term"))
    val inlineKept = RetrievalOps.dfCapTerms(dt0,
      docs.filter(col("text").isNotNull).agg(count(lit(1)).as("n_docs")))
      .collect().map(_.getString(0)).toSet
    val idx = java.nio.file.Files.createTempDirectory("graft-nullcap").toString + "/idx"
    SearchIndex.buildIndex(spark, docs, idx)
    val storeKept = RetrievalOps.dfCapTerms(
      spark.read.parquet(s"$idx/postings.parquet")
        .select(col("doc_id"), col("term")),
      SearchIndex.residentDocIds(spark, idx).agg(count(lit(1)).as("n_docs")))
      .collect().map(_.getString(0)).toSet
    assert(inlineKept === storeKept)
    assert(!inlineKept("a"), "df=3 of 4 indexable docs must be capped")
    assert(inlineKept === Set("b", "c", "d"))
  }

  test("Zipfian lane: df(zK) = ceil(N/K), the cap drops exactly the z1 " +
      "stopword, and the capped lexical ranking stays rich") {
    val docs = graft.Tables.table(spark, dir, "documents")
    val n = docs.count()
    val df = RetrievalOps.zipfTerms(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df.size === RetrievalOps.ZipfVocab)
    (1 to RetrievalOps.ZipfVocab).foreach { k =>
      assert(df(s"z$k") === (n + k - 1) / k, s"df(z$k)") // doc_ids 0..N-1
    }
    // the cap's survivors: every term except the df=N stopword
    val kept = RetrievalOps.dfCapTerms(
      RetrievalOps.zipfTerms(docs),
      docs.agg(count(lit(1)).as("n_docs")))
      .collect().map(_.getString(0)).toSet
    assert(kept === (2 to RetrievalOps.ZipfVocab).map(k => s"z$k").toSet)
    // and the fused output still carries a real lexical signal: docs
    // ranked by BOTH lists exist, so the cap did not degenerate the lane
    // to vector-only (the round-10 verdict's fixture requirement)
    val h = QueryRegistry.byName("q_hybrid_search_zipf").run(spark, dir)
    assert(h.filter(col("lex_rank") > 0 && col("vec_rank") > 0).count() > 0)
    assert(h.filter(col("lex_rank") > 0).count() >= 20,
      "lexical candidates must survive the cap for most queries")
  }

  test("hybrid RRF: fused score arithmetic and rank discipline") {
    val h = QueryRegistry.byName("q_hybrid_search").run(spark, dir).cache()
    try {
      assert(h.count() > 0)
      // rrf_ppm always equals the two rank contributions, integer-exact
      val bad = h.filter(col("rrf_ppm") =!=
        (when(col("lex_rank") > 0, expr("1000000 div (60 + lex_rank)")).otherwise(0L) +
          when(col("vec_rank") > 0, expr("1000000 div (60 + vec_rank)")).otherwise(0L)))
      assert(bad.count() === 0)
      // a doc ranked by BOTH lists beats one ranked by a single list at
      // similar depth: verify ordering is by rrf_ppm desc within query
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rank"))
      val mono = h.withColumn("prev", lag(col("rrf_ppm"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev") < col("rrf_ppm"))
      assert(mono.count() === 0, "rrf_ppm must be non-increasing in rank")
      // both retrieval modes actually contribute somewhere
      assert(h.filter(col("lex_rank") > 0 && col("vec_rank") > 0).count() > 0)
      assert(h.filter(col("lex_rank") === 0 || col("vec_rank") === 0).count() > 0,
        "fixture too easy: every fused doc appears in both lists")
    } finally { h.unpersist(); () }
  }
}
