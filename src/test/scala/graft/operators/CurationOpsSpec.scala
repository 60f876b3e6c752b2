package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Semantic invariants of the round-3 curation/quantization operators on
  * the real sf0.001 fixture (exactness itself rides the DuckDB oracle
  * gate; these pin the properties a consumer relies on). */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = QueryRegistry.byName(name).run(spark, dir)

  test("q_repetition: fractions bounded, one row per document") {
    val rep = run("q_repetition").cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rep.count() === nDocs)
    val bad = rep.filter(
      col("max_tok_frac") <= 0.0 || col("max_tok_frac") > 1.0 ||
        col("dup_2gram_frac") < 0.0 || col("dup_2gram_frac") > 1.0 ||
        col("dup_3gram_frac") < 0.0 || col("dup_3gram_frac") > 1.0)
    assert(bad.count() === 0)
    // the planted near-duplicate corpus must flag SOMETHING repetitive on
    // a fully-repeated probe: dup fraction of "x y x y x y" 2-grams > 0
    val probe = Seq((0L, "x y x y x y")).toDF("doc_id", "text")
    // (direct formula probe documents the threshold semantics)
    val w = split(trim(col("text")), " ")
    val grams = transform(sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
    val frac = probe.select((lit(1.0) -
      size(array_distinct(grams)).cast("double") / size(grams).cast("double")).as("f"))
      .head().getDouble(0)
    assert(frac > 0.5)
  }

  test("q_stratified_sample: at most N per stratum, contiguous ranks") {
    val s = run("q_stratified_sample").cache()
    val perLang = s.groupBy(col("lang")).agg(
      count(lit(1)).as("n"), max(col("sample_rank")).as("mx"),
      min(col("sample_rank")).as("mn")).collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      assert(r.getLong(1) <= 20L)
      assert(r.getLong(2) === r.getLong(1)) // max rank == count (contiguous)
      assert(r.getLong(3) === 1L)
    }
    // deterministic: two runs agree exactly
    val again = run("q_stratified_sample")
    assert(s.exceptAll(again).count() === 0 && again.exceptAll(s).count() === 0)
  }

  test("q_tfidf: at most k terms per doc, scores non-increasing in rank") {
    val t = run("q_tfidf").cache()
    assert(t.groupBy(col("doc_id")).count().filter(col("count") > 3).count() === 0)
    // within a doc, rank order == score order (desc)
    val viol = t.as("a").join(t.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rank") < col("b.rank"))
      .filter(col("a.score") < col("b.score"))
    assert(viol.count() === 0)
  }

  test("q_quantize: int8 error bounded by half a quantization step") {
    val q = run("q_quantize").cache()
    assert(q.count() === spark.read.parquet(s"$dir/embeddings.parquet").count())
    // symmetric int8: |err| <= 0.5/scale = amax/254 (+ double-rounding slack)
    val viol = q.filter(col("max_abs_err") > col("amax") / 254.0 * 1.000001)
    assert(viol.count() === 0)
    assert(q.filter(col("mean_abs_err") > col("max_abs_err")).count() === 0)
  }
}
