package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingests and fine-grained partitions
  * accumulate files far below the scan-efficient size, and each file
  * costs a task, an open, and a footer read. Compaction rewrites a
  * parquet directory into ⌈bytes / targetBytes⌉ files, optionally
  * range-clustered on sort columns so min/max footer stats prune scans
  * (poor man's clustering index — the same reasoning as
  * [[PartitionedLayout]], at file rather than directory granularity).
  *
  * The rewrite goes through a sibling temp directory and two renames —
  * the table directory always holds a complete copy of the data (no
  * reader-visible window with partial files), matching how table formats
  * without a metadata layer do swaps.
  */
object Compaction {

  final case class Report(
      filesBefore: Int, filesAfter: Int, bytes: Long, targetFiles: Int)

  /** Compact `dir` (a parquet directory) to ~`targetBytes` files.
    * `sortCols` range-partitions and sorts-within-partitions so each
    * output file covers a tight range of the sort key. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Report = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val n = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    val tmp = new Path(path.getParent, path.getName + ".compact-tmp")
    val bak = new Path(path.getParent, path.getName + ".compact-bak")
    fs.delete(tmp, true)
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // two-rename swap: the table path never exposes partial data
    fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compaction swap failed: $path -> $bak")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    Report(before.length, after.length, bytes, n)
  }
}
