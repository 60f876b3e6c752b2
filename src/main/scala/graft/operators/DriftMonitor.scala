package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring for a LIVE ingest: persist a baseline of
  * the per-(source, length-bucket) shares the sampling weights were tuned
  * on ([[CorpusDiff.bucketShares]] — the exact geometry the gated
  * `q_corpus_drift` lane hash-checks), then compare every incoming batch
  * against it and alert when a source's share profile moves more than a
  * threshold. The streaming face is [[graft.streaming.DocStream
  * .driftMonitorStream]]; alerts land in the SAME persisted findings
  * ledger as the fsck health lane ([[IndexFsck.logFindings]]), so one
  * triage queue covers structural breaks AND statistical ones.
  *
  * Scale shape: the batch reduces to (source, bucket) counts map-side
  * before anything joins; the baseline is a bounded artifact
  * (sources × 16 buckets) read once per tick and broadcast. Nothing here
  * touches corpus text beyond the one tokenizing projection.
  */
object DriftMonitor {

  /** Baseline table name under the monitor dir. */
  private[graft] val BaselineTable = "baseline.parquet"

  /** Persist the reference share profile of `docs` (needs (source, text))
    * under `dir` — a writer like any other: lock+lease serialized, staged
    * atomic publish. Re-running overwrites (re-baselining after an
    * accepted distribution change is the normal operator move). */
  def writeBaseline(spark: SparkSession, docs: DataFrame, dir: String): Unit =
    StoreLock.withLock(spark, dir, "drift-baseline") {
      AtomicPublish.stageAndRename(spark, dir, ".baseline.tmp", BaselineTable) {
        tmp =>
          CorpusDiff.bucketShares(docs.select(col("source"), col("text")), "base_pm")
            .select(col("source"), col("bucket"), col("base_pm"))
            .write.mode("overwrite").parquet(tmp.toString)
      }
    }

  /** Per-(source, bucket) drift of `batch` against the persisted
    * baseline: (source, bucket, base_pm, batch_pm, delta_pm). Only
    * sources with at least `minDocs` docs IN THE BATCH are judged — a
    * three-document trickle from a source is sampling noise, not a
    * distribution (its turn comes when volume does); for judged sources
    * the comparison is full-outer per bucket, so mass APPEARING in an
    * unbaselined bucket and mass VANISHING from a baselined one both
    * surface. */
  def drift(
      spark: SparkSession, batch: DataFrame, dir: String,
      minDocs: Long = 20L): DataFrame = {
    val base = spark.read.parquet(s"$dir/$BaselineTable")
    val b = CorpusDiff
      .bucketShares(batch.select(col("source"), col("text")), "batch_pm")
      .filter(col("n") >= minDocs)
      .select(col("source"), col("bucket"), col("batch_pm"))
    // judge only sources the batch carries enough of: an inner join on
    // the batch's source set first, so a source absent from this batch
    // doesn't read as "all its buckets drifted to zero"
    val active = b.select(col("source")).distinct()
    base.join(active, "source")
      .join(b, Seq("source", "bucket"), "full")
      .select(col("source"), col("bucket"),
        coalesce(col("base_pm"), lit(0L)).as("base_pm"),
        coalesce(col("batch_pm"), lit(0L)).as("batch_pm"))
      .withColumn("delta_pm", abs(col("base_pm") - col("batch_pm")))
  }

  /** The alert rows of [[drift]] as ledger-ready findings: one WARN per
    * (source, bucket) whose share moved ≥ `thresholdPm`. Bounded output
    * (≤ sources × 16), collected driver-side by construction. */
  def driftFindings(
      spark: SparkSession, batch: DataFrame, dir: String,
      thresholdPm: Long, minDocs: Long = 20L): Seq[IndexFsck.Finding] =
    drift(spark, batch, dir, minDocs)
      .filter(col("delta_pm") >= thresholdPm)
      .orderBy(col("source"), col("bucket"))
      .collect()
      .toSeq
      .map { r =>
        IndexFsck.Finding(
          dir, "drift", "distribution_drift", "warn",
          s"source=${r.getAs[String]("source")} bucket=${r.getAs[Long]("bucket")} " +
            s"base_pm=${r.getAs[Long]("base_pm")} batch_pm=${r.getAs[Long]("batch_pm")} " +
            s"delta_pm=${r.getAs[Long]("delta_pm")}")
      }
}
