package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Semantic invariants of the corpus-level operators on the real sf0.001
  * fixture (exactness itself rides the DuckDB oracle gate; these pin the
  * properties a consumer relies on). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = QueryRegistry.byName(name).run(spark, dir)

  test("q_pack_sequences: spans tile the token stream exactly") {
    val p = run("q_pack_sequences").cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(p.count() === nDocs)
    // conservation: total tokens == the end of the last span
    val total = p.agg(sum(col("toks"))).head().getLong(0)
    val lastEnd = p.agg(max(col("start_tok") + col("toks"))).head().getLong(0)
    assert(total === lastEnd)
    // spans are gapless: every start offset is another span's end (or 0)
    val starts = p.select(col("start_tok")).except(
      p.select((col("start_tok") + col("toks")).as("start_tok"))
        .union(spark.range(1).select(lit(0L).as("start_tok"))))
    assert(starts.count() === 0)
    // bin arithmetic is consistent
    val badBins = p.filter(
      col("start_bin") > col("end_bin") ||
        col("n_bins") =!= col("end_bin") - col("start_bin") + 1 ||
        col("start_bin") =!= expr("start_tok div 512"))
    assert(badBins.count() === 0)
  }

  test("q_bpe_merge: contiguous ranks, non-increasing counts") {
    val m = run("q_bpe_merge").cache()
    val rows = m.orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(rows.head.fieldIndex("rank"))).toSeq ===
      (1L to rows.length))
    val cnts = rows.map(_.getLong(rows.head.fieldIndex("cnt"))).toSeq
    assert(cnts === cnts.sorted.reverse, s"counts not non-increasing: $cnts")
  }

  test("q_keyword_search: bounded result, monotone scores, real hits") {
    val s = run("q_keyword_search").cache()
    assert(s.count() <= 20)
    val rows = s.orderBy(col("rank")).collect()
    val scores = rows.map(_.getLong(rows.head.fieldIndex("score"))).toSeq
    assert(scores === scores.sorted.reverse)
    assert(rows.forall(_.getLong(rows.head.fieldIndex("n_hits")) >= 1))
  }

  test("q_doc_rarity: mean df bounded by corpus size") {
    val r = run("q_doc_rarity").cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(r.count() === nDocs)
    val bad = r.filter(
      col("mean_df") < 1.0 || col("mean_df") > nDocs.toDouble ||
        col("n_terms") < 1)
    assert(bad.count() === 0)
  }

  test("q_source_similarity: ordered pairs, jaccard and intersection bounds") {
    val s = run("q_source_similarity").cache()
    val bad = s.filter(
      col("source_a") >= col("source_b") ||
        col("n_inter") > least(col("n_a"), col("n_b")) ||
        col("jaccard") <= 0.0 || col("jaccard") > 1.0)
    assert(bad.count() === 0)
    assert(s.count() >= 1)
  }

  test("q_kmv_distinct: estimate lands near the exact cardinality") {
    val k = run("q_kmv_distinct").cache()
    assert(k.count() >= 1) // every source has >= 64 distinct shingles here
    // k=64 → standard error ≈ 1/sqrt(62) ≈ 13%; 2x is a generous gate that
    // still catches an estimator that is off by construction
    val bad = k.filter(
      col("kmv_estimate") < col("n_exact") / 2 ||
        col("kmv_estimate") > col("n_exact") * 2)
    val badRows = bad.collect()
    assert(badRows.isEmpty, s"estimates off >2x: ${badRows.mkString(", ")}")
  }

  test("q_kmv_union: merged-sketch estimates respect the lattice inequalities") {
    val u = run("q_kmv_union").cache()
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(u.count() === nSources * (nSources - 1) / 2)
    // kth(union sketch) <= kth(each sketch) → est_union >= max(est_a, est_b);
    // inclusion-exclusion then bounds the intersection by the smaller side
    val bad = u.filter(
      col("est_union") < greatest(col("est_a"), col("est_b")) ||
        col("est_intersection") > least(col("est_a"), col("est_b")) ||
        col("est_intersection") < 0)
    assert(bad.count() === 0)
  }

  test("q_gram_int8: true Gram matrix — full triangle, Cauchy-Schwarz holds") {
    val g = run("q_gram_int8").cache()
    assert(g.count() === 64L * 65 / 2)
    val entries = g.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // diagonal of Σ q qᵀ is a sum of squares
    (0 until 64).foreach(i => assert(entries((i.toLong, i.toLong)) >= 0L))
    // every 2x2 principal minor of a Gram matrix is nonneg:
    // g_ij² ≤ g_ii·g_jj — catches any indexing slip in the flat buffer
    entries.foreach { case ((i, j), gij) =>
      val (gii, gjj) = (entries((i, i)), entries((j, j)))
      assert(BigInt(gij) * BigInt(gij) <= BigInt(gii) * BigInt(gjj),
        s"Cauchy-Schwarz violated at ($i,$j)")
    }
  }

  test("q_length_quantiles: ordered quantiles within the observed range") {
    val q = run("q_length_quantiles").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (mn, mx) = (docs.agg(min("n_chars")).head().getLong(0),
      docs.agg(max("n_chars")).head().getLong(0))
    val bad = q.filter(
      col("p50") > col("p90") || col("p90") > col("p99") ||
        col("p50") < mn || col("p99") > mx)
    assert(bad.count() === 0)
    assert(q.count() === docs.select("source").distinct().count())
  }

  test("q_dedup_incremental: pairs cross the split only, never within a side") {
    val p = run("q_dedup_incremental").cache()
    def bucket(c: org.apache.spark.sql.Column) =
      pmod(pmod(c * lit(2654435761L), lit(4294967296L)), lit(100L))
    val bad = p.filter(
      bucket(col("old_id")) >= 80 || bucket(col("new_id")) < 90 ||
        col("jaccard") < 0.5 || col("jaccard") > 1.0)
    assert(bad.count() === 0)
  }

  test("q_weighted_sample: kept set respects the acceptance inequality") {
    val s = run("q_weighted_sample").cache()
    assert(s.count() >= 1)
    val bad = s.filter(
      col("u") >= col("weight") * 0.5 ||
        col("u") < 0.0 || col("u") >= 1.0 ||
        col("weight") < 0.0 || col("weight") > 1.0)
    assert(bad.count() === 0)
  }

  test("q_hourly_anomaly: only >2-sigma hours flagged") {
    val a = run("q_hourly_anomaly").cache()
    assert(a.count() >= 1)
    // every flagged row actually deviates: |cnt - mean| > 2σ ⇒ |z| > 2
    assert(a.filter(abs(col("z")) <= 2.0).count() === 0)
  }

  test("q_retention: day-zero rows account for every user exactly once") {
    val r = run("q_retention").cache()
    assert(r.filter(col("days_since") < 0).count() === 0)
    // every user appears in exactly one cohort's day-0 row
    val day0Users = r.filter(col("days_since") === 0)
      .agg(sum(col("n_users"))).head().getLong(0)
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(day0Users === users)
    // retention never exceeds the cohort size
    val day0 = r.filter(col("days_since") === 0)
      .select(col("cohort_date"), col("n_users").as("cohort_size"))
    val bad = r.join(day0, "cohort_date").filter(col("n_users") > col("cohort_size"))
    assert(bad.count() === 0)
  }

  test("q_histogram: bins partition the table, bounds respected") {
    val h = run("q_histogram").cache()
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(h.agg(sum(col("n_items"))).head().getLong(0) === n)
    val bad = h.filter(
      col("min_cents") < col("bin_lo_cents") ||
        col("max_cents") >= col("bin_lo_cents") + 500000L ||
        col("min_cents") > col("max_cents"))
    assert(bad.count() === 0)
  }

  test("q_bpe_train: iterated merges are greedy, ordered, and consume merged pairs") {
    import spark.implicits._
    // "a b" dominates (5 weighted: 2 copies of doc A carry 2 each, doc B 1);
    // after merge 1 rewrites it to a_b, "a_b c" (3) must win step 2 —
    // i.e. training must re-count over the MERGED corpus, and the greedy
    // left-to-right rewrite must not re-use a consumed token
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpetrain").toString
    Seq(
      (1L, "a b c a b c x"),
      (2L, "a b c a b c x"),
      (3L, "a b y a a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = QueryRegistry.byName("q_bpe_train").run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // (a,b): 2×2 from doc A + 1 from doc B = 5
    assert(m(0) === ((1L, "a", "b", 5L)))
    // re-counted over the MERGED corpus: "a_b c" twice per A copy = 4
    assert(m(1) === ((2L, "a_b", "c", 4L)))
    // A is now "a_b_c a_b_c x": (a_b_c,a_b_c)=2 ties (a_b_c,x)=2 and the
    // lexicographic tie-break picks the former; greedy left-to-right then
    // merges the pair ONCE (consumed tokens are not reused)
    assert(m(2) === ((3L, "a_b_c", "a_b_c", 2L)))
    assert(m(3) === ((4L, "a_b_c_a_b_c", "x", 2L)))
  }

  test("q_winsorize: clamp fractions respect the percentile ranks") {
    val w = run("q_winsorize").cache()
    val n = w.agg(sum(col("n_docs"))).head().getLong(0)
    val nLow = w.agg(sum(col("n_low"))).head().getLong(0)
    val nHigh = w.agg(sum(col("n_high"))).head().getLong(0)
    // strictly-below-p5 is < ceil(5% N); strictly-above-p95 is <= N - ceil(95% N)
    assert(nLow < (n * 5 + 99) / 100, s"n_low=$nLow of $n")
    assert(nHigh <= n - (n * 95 + 99) / 100, s"n_high=$nHigh of $n")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (mn, mx) = (docs.agg(min("n_chars")).head().getLong(0),
      docs.agg(max("n_chars")).head().getLong(0))
    val bad = w.filter(
      col("mean_winsorized") < mn.toDouble || col("mean_winsorized") > mx.toDouble)
    assert(bad.count() === 0)
  }
}
