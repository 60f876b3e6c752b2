package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Recrawl snapshot diffing and distribution-drift monitoring — the gate
  * a production training pipeline runs BEFORE retraining on a fresh
  * crawl: which pages appeared/vanished/changed since the last snapshot,
  * and did the per-source length distribution shift enough to invalidate
  * sampling weights. (The reference has no corpus versioning; this is
  * part of the extended LLM-pipeline surface, like the dedup/ANN
  * families.)
  *
  * The two snapshots are DERIVED deterministically from the one
  * `documents` table the driver ships (the q_redact move — the scenario
  * is synthesized in-lane, identically in both engines, so the OPERATOR
  * is hash-gated even though the fixture has no real second crawl):
  *
  *   OLD = docs with doc_id % 7 != 3          (1/7 were not yet crawled)
  *   NEW = docs with doc_id % 13 != 7         (1/13 vanished since), and
  *         docs with doc_id % 11 == 5 carry a ' (rev)' suffix (recrawl
  *         picked up changed content)
  *
  * Scale shape: each side is a map-only projection to
  * (doc_id, source, md5(text), n_toks) — the DIGEST-EARLY move: the
  * change verdict needs only equality of content, so the full-outer
  * diff join shuffles narrow digest rows on doc_id (colocatable,
  * AQE-coalesced), never two copies of the corpus text. The drift lane
  * reduces each side to per-(source, bucket) counts BEFORE any join —
  * bounded cardinality (sources × 16 buckets) regardless of corpus
  * size. All arithmetic is BIGINT (counts, integer-div per-mille
  * shares): bit-identical in Spark and DuckDB. */
object CorpusDiff {
  import Tables.table

  private def nToks = size(split(trim(col("text")), " ")).cast(LongType)

  /** The previous crawl: pages with doc_id % 7 == 3 did not exist yet. */
  private def oldSnap(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), col("source"), col("text"))

  /** The fresh crawl: 1/13 of pages vanished, 1/11 changed content. */
  private def newSnap(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 13 =!= 7)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 11 === 5, concat(col("text"), lit(" (rev)")))
          .otherwise(col("text")).as("text"))

  private def digests(snap: DataFrame, suffix: String): DataFrame =
    snap.select(col("doc_id"),
      col("source").as(s"source_$suffix"),
      md5(col("text")).as(s"d_$suffix"),
      nToks.as(s"toks_$suffix"))

  /** q_corpus_diff: per (source, change) attrition/addition census —
    * change ∈ added | removed | changed | unchanged; n_toks counts the
    * surviving side (new for added/changed/unchanged, old for removed). */
  private def qCorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val j = digests(oldSnap(d), "old")
      .join(digests(newSnap(d), "new"), Seq("doc_id"), "full")
    j.select(
      coalesce(col("source_new"), col("source_old")).as("source"),
      when(col("d_old").isNull, "added")
        .when(col("d_new").isNull, "removed")
        .when(col("d_old") =!= col("d_new"), "changed")
        .otherwise("unchanged").as("change"),
      coalesce(col("toks_new"), col("toks_old")).as("t"))
      .groupBy(col("source"), col("change"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_toks"))
  }

  private val qCorpusDiffSql: String =
    s"""WITH oldsnap AS (
       |  SELECT doc_id, source, md5(text) AS d,
       |    len(string_split(trim(text), ' '))::BIGINT AS toks
       |  FROM documents WHERE doc_id % 7 != 3),
       |newsnap AS (
       |  SELECT doc_id, source, md5(t) AS d,
       |    len(string_split(trim(t), ' '))::BIGINT AS toks
       |  FROM (SELECT doc_id, source,
       |          CASE WHEN doc_id % 11 = 5 THEN text || ' (rev)' ELSE text END AS t
       |        FROM documents WHERE doc_id % 13 != 7))
       |SELECT COALESCE(n.source, o.source) AS source,
       |  CASE WHEN o.d IS NULL THEN 'added'
       |       WHEN n.d IS NULL THEN 'removed'
       |       WHEN o.d != n.d THEN 'changed'
       |       ELSE 'unchanged' END AS change,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(COALESCE(n.toks, o.toks)) AS BIGINT) AS n_toks
       |FROM oldsnap o FULL OUTER JOIN newsnap n USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** q_corpus_drift: per (source, length-bucket) share shift between the
    * snapshots, in integer per-mille — the sampling-weights-still-valid
    * gate. Each side reduces to (source, bucket) counts BEFORE the join;
    * per-source totals broadcast back. Token-length bucket: linear
    * width 8, capped at 15 — pure integer `div` (a log2 bucket would
    * ride float rounding at the boundaries; Spark's `/` on longs is
    * DOUBLE division), identical in both engines. */
  /** Per-(source, length-bucket) census of a (source, text) doc set:
    * (source, bucket, c, n, <pm>) with the share in integer per-mille —
    * the drift lane's geometry, shared with [[DriftMonitor]] (the
    * streaming ingest-health lane compares live batches against a
    * persisted baseline of exactly these shares). c/n ride along so a
    * consumer can apply a min-mass guard; the gated lane projects them
    * away. */
  private[graft] def bucketShares(snap: DataFrame, pm: String): DataFrame = {
    val cnt = snap.select(col("source"), nToks.as("n_toks"))
      .select(col("source"), expr("least(n_toks div 8, 15L)").as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
    cnt.join(broadcast(tot), "source")
      .select(col("source"), col("bucket"), col("c"), col("n"),
        expr("(c * 1000) div n").as(pm))
  }

  private def qCorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    def shares(snap: DataFrame, pm: String): DataFrame =
      bucketShares(snap, pm).select(col("source"), col("bucket"), col(pm))
    shares(oldSnap(d), "old_pm")
      .join(shares(newSnap(d), "new_pm"), Seq("source", "bucket"), "full")
      .select(col("source"), col("bucket"),
        coalesce(col("old_pm"), lit(0L)).as("old_pm"),
        coalesce(col("new_pm"), lit(0L)).as("new_pm"),
        abs(coalesce(col("old_pm"), lit(0L)) - coalesce(col("new_pm"), lit(0L)))
          .as("delta_pm"))
  }

  private val qCorpusDriftSql: String =
    s"""WITH oldsnap AS (
       |  SELECT source,
       |    LEAST(len(string_split(trim(text), ' ')) // 8, 15)::BIGINT AS bucket
       |  FROM documents WHERE doc_id % 7 != 3),
       |newsnap AS (
       |  SELECT source,
       |    LEAST(len(string_split(trim(
       |      CASE WHEN doc_id % 11 = 5 THEN text || ' (rev)' ELSE text END
       |    ), ' ')) // 8, 15)::BIGINT AS bucket
       |  FROM documents WHERE doc_id % 13 != 7),
       |o AS (
       |  SELECT source, bucket, (COUNT(*) * 1000) //
       |    SUM(COUNT(*)) OVER (PARTITION BY source) AS old_pm
       |  FROM oldsnap GROUP BY 1, 2),
       |n AS (
       |  SELECT source, bucket, (COUNT(*) * 1000) //
       |    SUM(COUNT(*)) OVER (PARTITION BY source) AS new_pm
       |  FROM newsnap GROUP BY 1, 2)
       |SELECT source, bucket,
       |  COALESCE(old_pm, 0)::BIGINT AS old_pm,
       |  COALESCE(new_pm, 0)::BIGINT AS new_pm,
       |  ABS(COALESCE(old_pm, 0) - COALESCE(new_pm, 0))::BIGINT AS delta_pm
       |FROM o FULL OUTER JOIN n USING (source, bucket)""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_corpus_diff", qCorpusDiff, Some(qCorpusDiffSql)),
    QueryDef("q_corpus_drift", qCorpusDrift, Some(qCorpusDriftSql)))
}
