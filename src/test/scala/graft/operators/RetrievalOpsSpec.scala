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
