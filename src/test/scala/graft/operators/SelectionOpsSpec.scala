package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The round-6 selection/decontamination operators: the Bloom-filter
  * contamination twin (must be bit-identical to the exact lane — that is
  * its whole contract), DSIR hashed-feature voting (signal direction +
  * bounds), and BPE encode (token conservation). Value exactness itself
  * rides the DuckDB oracle gate. */
class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = QueryRegistry.byName(name).run(spark, dir)

  test("q_contamination_bloom: bit-identical to the exact contamination lane") {
    val exact = run("q_contamination").collect().map(_.toSeq).toSet
    val bloom = run("q_contamination_bloom").collect().map(_.toSeq).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty)
  }

  test("q_dsir_vote: bounds, totals, and target-slice signal direction") {
    val v = run("q_dsir_vote").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    assert(v.count() === docs.count())
    // every token votes in [-1, 1], so |score| <= n_tokens
    assert(v.filter(abs(col("dsir_vote")) > col("n_tokens")).count() === 0)
    // n_tokens is the real token count
    val joined = v.join(docs, "doc_id")
      .filter(col("n_tokens") =!= size(split(trim(col("text")), " ")))
    assert(joined.count() === 0)
    // the selection signal points the right way: the target slice ('en')
    // must score more target-like than the rest on average
    val mean = v.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_vote").cast("double") / col("n_tokens")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mean(true) > mean(false),
      s"target-slice mean vote ${mean(true)} not above raw ${mean(false)}")
  }

  test("q_bpe_encode: token conservation and applied merges") {
    val e = run("q_bpe_encode").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(e.count() === docs.count())
    assert(e.filter(col("n_tokens_raw") - col("n_tokens_bpe") =!= col("n_merged"))
      .count() === 0)
    assert(e.filter(col("n_merged") < 0).count() === 0)
    // the learned merges actually fire somewhere in the corpus
    assert(e.agg(sum(col("n_merged"))).head().getLong(0) > 0)
    // identical texts encode identically
    val perText = e.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("text"))
      .agg(countDistinct(col("n_tokens_bpe")).as("n"))
      .filter(col("n") =!= 1)
    assert(perText.count() === 0)
  }
}
