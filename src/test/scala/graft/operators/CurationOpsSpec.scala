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

  test("q_token_budget: budget respected, binding, and prefix-maximal") {
    val kept = run("q_token_budget").cache()
    assert(kept.filter(col("cum_toks") > 800L).count() === 0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the budget binds: every stratum's total exceeds it, so some doc of
    // every source is excluded
    val keptPer = kept.groupBy(col("source")).count()
    val allPer = docs.groupBy(col("source")).count()
    val short = keptPer.as("k").join(allPer.as("a"), "source")
      .filter(col("k.count") >= col("a.count"))
    assert(short.count() === 0)
    // prefix-maximality: the first EXCLUDED doc per source (in hash
    // order) would push the running total past the budget
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val toks = size(split(trim(col("text")), " ")).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = docs.select(col("source"), col("doc_id"), h.as("h"), toks.as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
    val firstExcluded = naive.filter(col("cum") > 800L)
      .groupBy(col("source")).agg(min(col("cum")).as("cum"))
    // its cumulative total minus budget is positive for every source
    assert(firstExcluded.filter(col("cum") <= 800L).count() === 0)
    // and the two-phase implementation equals the naive spec exactly
    val naiveKept = naive.filter(col("cum") <= 800L)
      .select(col("source"), col("doc_id"), col("toks"), col("cum").as("cum_toks"))
    assert(kept.exceptAll(naiveKept).count() === 0)
    assert(naiveKept.exceptAll(kept).count() === 0)
  }

  test("q_kmedians_step: full assignment, clusters preserved, finite shifts") {
    val step = run("q_kmedians_step").cache()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(step.agg(sum(col("n_assigned"))).head().getLong(0) === e.count())
    val labels = e.select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(step.select(col("cluster")).collect().map(_.getLong(0)).toSet === labels)
    assert(step.filter(col("centroid_shift") < 0.0 ||
      col("centroid_shift").isNull || isnan(col("centroid_shift"))).count() === 0)
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
