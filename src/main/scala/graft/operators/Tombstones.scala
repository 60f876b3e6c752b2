package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The persisted-index family's deletion discipline, extracted from the
  * per-family copies (the [[AtomicPublish]] lesson applied to
  * tombstones: two hand-rolled epoch/read/clear sequences — IvfIndex
  * and SearchIndex — were already drifting toward a third and fourth).
  *
  * One table per store, `indexDir/tombstones.parquet/epoch=K`, holding
  * the deleted keys under the store's own key column. Contract shared
  * by every family:
  *
  *  - [[delete]] is O(ids): one staged epoch, one rename — never a
  *    store rewrite;
  *  - every read path calls [[minus]], so deleted keys vanish from
  *    results immediately;
  *  - the family's compact folds the tombstoned rows out of its tables
  *    and then calls [[clear]] — publish-before-delete, so a crash in
  *    between leaves tombstones shadowing already-removed rows, a
  *    harmless no-op the next compact clears;
  *  - [[pending]] tells the compact to run even at one epoch (the
  *    EpochCompact no-op must not retire unapplied tombstones);
  *  - within a tombstone's lifetime a re-appended key stays dead;
  *    after the durable compact, re-insertion is a normal append.
  */
object Tombstones {

  private def dirOf(indexDir: String) = new Path(indexDir, "tombstones.parquet")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append an O(ids) tombstone epoch of `ids`'s `keyCol` values. */
  def delete(
      spark: SparkSession, indexDir: String, ids: DataFrame, keyCol: String): Unit = {
    val ts = dirOf(indexDir)
    val fs = fsOf(spark, ts)
    val next =
      if (!fs.exists(ts)) 0
      else fs.listStatus(ts).map(_.getPath.getName)
        .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toInt)
        .foldLeft(-1)(math.max) + 1
    AtomicPublish.stageAndRename(
      spark, ts.toString, s".epoch-$next.tmp", s"epoch=$next") { tmp =>
      ids.select(col(keyCol)).distinct()
        .write.mode("overwrite").parquet(tmp.toString)
    }
  }

  /** The current tombstone set, if any. */
  def ids(
      spark: SparkSession, indexDir: String, keyCol: String): Option[DataFrame] = {
    val ts = dirOf(indexDir)
    val fs = fsOf(spark, ts)
    if (fs.exists(ts) && fs.listStatus(ts).exists(_.getPath.getName.startsWith("epoch=")))
      Some(spark.read.parquet(ts.toString).select(col(keyCol)).distinct())
    else None
  }

  /** Anti-join `df` (carrying `keyCol`) against the tombstone set —
    * the read-path half of deletion. */
  def minus(
      spark: SparkSession, indexDir: String, df: DataFrame, keyCol: String): DataFrame =
    ids(spark, indexDir, keyCol).fold(df)(ts => df.join(ts, Seq(keyCol), "left_anti"))

  /** Unapplied deletions exist — the family's compact must run even at
    * one epoch. */
  def pending(spark: SparkSession, indexDir: String): Boolean = {
    val ts = dirOf(indexDir)
    val fs = fsOf(spark, ts)
    fs.exists(ts) && fs.listStatus(ts).exists(_.getPath.getName.startsWith("epoch="))
  }

  /** Retire the table after a compact made the deletions durable. */
  def clear(spark: SparkSession, indexDir: String): Unit = {
    val ts = dirOf(indexDir)
    fsOf(spark, ts).delete(ts, true)
    ()
  }
}
