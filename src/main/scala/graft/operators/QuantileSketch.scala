package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k-sample grouped quantile ESTIMATION — the mergeable sketch that
  * replaces exact order statistics when the value domain itself is too
  * large to window (exact grouped quantiles — q_length_quantiles — windows
  * the (group × distinct value) domain, which for a high-cardinality
  * metric at 100 TB is the corpus again).
  *
  * Sketch: per group keep the k documents with the smallest PORTABLE
  * per-doc hash — a deterministic uniform sample (the KMV move applied to
  * order statistics instead of cardinality). Quantiles of the sample
  * estimate quantiles of the group with error O(1/√k), and the sample is
  * MERGEABLE: bottom-k of a union = bottom-k of the per-part bottom-ks,
  * so partial results combine map-side.
  *
  * Scale shape: the rank filter `row_number ≤ k` over (hash, doc_id)
  * plans as WindowGroupLimit — every task keeps only its local k minima
  * BEFORE the exchange (verified: the same property q_kmv_distinct
  * documents), so the shuffle moves ≤ k·tasks rows per group, never the
  * corpus. The quantile extraction then runs on ≤ k rows per group.
  *
  * Determinism: the sampling hash is a MINSTD step on doc_id mod P —
  * portable integer arithmetic both engines replay exactly (products
  * bounded by P·48271 ≈ 4.8e13, far from BIGINT overflow, which DuckDB
  * would reject rather than wrap). Percentile ranks use the repo's
  * integer ceiling discipline ((m·p + 99) div 100).
  */
object QuantileSketch {
  import Tables.table

  /** Sample size per group: small enough that sf0.1's 250-doc sources
    * genuinely subsample, large enough for stable estimates. */
  private[operators] val K = 64
  private val P = graft.functions.PolyMinHash.P

  /** Portable uniform sampling hash of doc_id (MINSTD multiplier). */
  private def sampleHash(id: Column): Column =
    ((id % P) * 48271L + 11L) % P

  /** Per-source bottom-K of `rows` (source, doc_id, n_chars, h) by
    * (h, doc_id) — the mergeable pruning step: bottom-K of a union is
    * the bottom-K of the parts' bottom-Ks, which is what lets
    * [[SketchIndex]] store only each epoch's pruned sample. Plans as
    * WindowGroupLimit: each task keeps its local K minima pre-shuffle. */
  private[operators] def bottomK(rows: DataFrame): DataFrame = {
    val wS = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    rows.withColumn("r", row_number().over(wS)).filter(col("r") <= K).drop("r")
  }

  /** (source, doc_id, n_chars, h) sampling rows of a documents table. */
  private[operators] def sampleRows(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("h", sampleHash(col("doc_id")))

  /** Quantile estimates from a bottom-K `sample` and exact per-source
    * `counts` (source, n_docs) — shared by the inline and persisted-index
    * lanes so both are the same arithmetic by construction. */
  private[operators] def estimateFrom(sample: DataFrame, counts: DataFrame): DataFrame = {
    val m = sample.groupBy(col("source")).agg(count(lit(1)).as("m"))
    // value-rank within the ≤k sample; ceil-rank order statistic
    val wV = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("h"), col("doc_id"))
    val ranked = sample.withColumn("rv", row_number().over(wV))
    def est(p: Int): Column =
      min(when(col("rv") >= expr(s"(m * $p + 99) div 100"), col("n_chars")))
        .as(s"est_p$p")
    ranked.join(broadcast(m), Seq("source"))
      .groupBy(col("source"))
      .agg(first(col("m")).as("sample_m"), est(50), est(90), est(99))
      .join(broadcast(counts), Seq("source"))
      .select(col("source"), col("n_docs"), col("sample_m"),
        col("est_p50"), col("est_p90"), col("est_p99"))
  }

  private def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    estimateFrom(bottomK(sampleRows(docs)),
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
  }

  private[operators] val qQuantileSketchSql =
    s"""WITH h AS (
       |  SELECT source, doc_id, n_chars,
       |    ((doc_id % $P) * 48271 + 11) % $P AS h
       |  FROM documents),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY source ORDER BY h, doc_id) AS r FROM h),
       |s AS (SELECT * FROM r WHERE r <= $K),
       |m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS m FROM s GROUP BY 1),
       |rv AS (SELECT source, n_chars, h, doc_id, ROW_NUMBER() OVER (
       |         PARTITION BY source ORDER BY n_chars, h, doc_id) AS rv FROM s),
       |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |      FROM documents GROUP BY 1)
       |SELECT source, ANY_VALUE(n_docs) AS n_docs, ANY_VALUE(m) AS sample_m,
       |  MIN(CASE WHEN rv >= (m * 50 + 99) // 100 THEN n_chars END) AS est_p50,
       |  MIN(CASE WHEN rv >= (m * 90 + 99) // 100 THEN n_chars END) AS est_p90,
       |  MIN(CASE WHEN rv >= (m * 99 + 99) // 100 THEN n_chars END) AS est_p99
       |FROM rv JOIN m USING (source) JOIN n USING (source)
       |GROUP BY source""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_quantile_sketch", qQuantileSketch, Some(qQuantileSketchSql)))
}
