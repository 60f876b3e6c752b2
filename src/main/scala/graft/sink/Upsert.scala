package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE / SCD-1) into a parquet table — how an incremental
  * corpus absorbs a changeset without a table-format dependency: new rows
  * insert, matching keys take the changeset's version, and tombstones
  * delete. The rewrite reuses [[Compaction]]'s atomic two-rename swap, so
  * readers always see a complete table.
  *
  * Scale shape: ONE shuffle on the merge key (union → per-key keeper
  * window over ≤ |versions per key| rows); the changeset is typically a
  * small fraction of the table, and the planner broadcast-joins nothing —
  * this is deliberately a full-rewrite merge (the parquet-only contract;
  * partition-pruned variants layer on [[PartitionedLayout]] by merging
  * only touched partitions).
  */
object Upsert {

  final case class Report(before: Long, changes: Long, after: Long)

  /** Merge `changes` into the parquet table at `dir` on `key`.
    * `deleteCol`, when set, names a boolean column in `changes` marking
    * tombstones (dropped from the result and from the payload). */
  def merge(
      spark: SparkSession,
      dir: String,
      changes: DataFrame,
      key: String,
      deleteCol: Option[String] = None): Report = {
    val current = spark.read.parquet(dir)
    val before = current.count()
    val nChanges = changes.count()
    // precedence: changeset (1) beats table (0); newest wins per key
    val cur = current.withColumn("__prio", lit(0))
      .withColumn("__del", lit(false))
    val chg = deleteCol match {
      case Some(d) => changes.withColumn("__prio", lit(1))
        .withColumn("__del", coalesce(col(d).cast("boolean"), lit(false)))
        .drop(d)
      case None => changes.withColumn("__prio", lit(1))
        .withColumn("__del", lit(false))
    }
    val w = Window.partitionBy(col(key)).orderBy(col("__prio").desc)
    val merged = cur.unionByName(chg)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .drop("__prio", "__del", "__rn")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.getParent, path.getName + ".merge-tmp")
    val bak = new Path(path.getParent, path.getName + ".merge-bak")
    fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"merge swap failed: $path -> $bak")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path)
      throw new java.io.IOException(s"merge swap failed: $tmp -> $path")
    }
    fs.delete(bak, true)
    Report(before, nChanges, spark.read.parquet(dir).count())
  }
}
