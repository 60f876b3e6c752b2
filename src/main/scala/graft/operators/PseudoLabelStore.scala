package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The pseudo-label OUTPUT store — the 16th registered family: one table
  * `pseudo_labels.parquet/epoch=K/` of (vec_id, pred_label) rows written
  * by the ingest-time auto-labeling stream
  * ([[graft.streaming.DocStream.pseudoLabelStream]]). Single-table, so
  * each epoch's staged rename IS the commit point (no ledger, no twin
  * tables, no crash window); replay-idempotence lives in the stream's
  * resident-ids anti-join.
  *
  * Registered in [[graft.IndexCatalog.Families]] with the Rewrite
  * deletion discipline: a compliance request naming the labeled ids drops
  * their rows in one atomic whole-store rewrite folded to epoch=0 —
  * vec_id-keyed rows, nothing derived to reverse, so deletion leaves no
  * pending state and needs no compact. Registering (rather than leaving
  * the output dir family-less) is what makes the fleet machinery see it:
  * fsck detects it instead of erroring `unknown family`, and a takedown
  * sweep over a manifest containing it dispatches instead of refusing. */
object PseudoLabelStore {

  /** The signature (and only) table. */
  val Table = "pseudo_labels.parquet"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Distinct already-labeled ids — the stream's replay filter. Empty
    * frame for a store not yet created. */
  def residentVecIds(spark: SparkSession, dir: String): DataFrame = {
    val t = new Path(dir, Table)
    if (!fsOf(spark, t).exists(t)) {
      import spark.implicits._
      Seq.empty[Long].toDF("vec_id")
    } else spark.read.parquet(t.toString).select(col("vec_id")).distinct()
  }

  /** Rewrite-discipline deletion (victims arrive keyed `doc_id`, the
    * sweep's id convention — here they ARE the labeled vec_ids): drop the
    * victims' rows and republish the survivors as one epoch, atomically.
    * A missing store is a no-op — the sweep may fan one request over a
    * manifest where this store was never created. */
  def deleteFromStore(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    StoreLock.withLock(spark, dir, "pseudo-labels-delete") {
      val t = new Path(dir, Table)
      if (fsOf(spark, t).exists(t)) {
        val keep = spark.read.parquet(t.toString)
          .join(ids.select(col("doc_id").as("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("pred_label"))
          // the rewrite folds history to one epoch — materialize before
          // the swap deletes the directory the plan reads from
          .localCheckpoint()
        AtomicPublish.swapDir(spark, dir,
          tmpSuffix = ".delete-tmp", bakSuffix = ".delete-bak") { tmp =>
          keep.write.mode(SaveMode.Overwrite)
            .parquet(s"$tmp/$Table/epoch=0")
        }
      }
    }
}
