package graft.operators

import org.apache.spark.sql.SparkSession

/** The SECOND DRIVER of the shared-warm-store fleet spec
  * ([[SharedStoreFleetSpec]]): a real, separate Spark driver JVM pointed
  * at the SAME configurable store root ([[StoreRoot]]) as the first. It
  * must SERVE the store the first driver materialized — the memo check
  * resolving through the shared root — and never rebuild, which is the
  * whole point of round 14's un-pinning of the store root from
  * driver-local tmp: one driver pays the build, the fleet pays scans.
  *
  * Usage: `SharedStoreProbeMain <corpusDir> <storeRoot> <outDir>`
  *
  * Serves `LmIndex.ensureModel(corpusDir)` through the shared root,
  * scores the corpus against it, writes the scores to
  * `<outDir>/scores.parquet` and the served model dir path to
  * `<outDir>/modeldir.txt`, exits 0. Any rebuild would show as store
  * mtime churn, which the spec snapshots around this process. */
object SharedStoreProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, storeRoot, outDir) = args
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(StoreRoot.ConfKey, storeRoot)
    graft.Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mdir = LmIndex.ensureModel(spark, corpusDir)
    LmIndex.scoreDocs(spark, graft.Tables.table(spark, corpusDir, "documents"), mdir)
      .write.mode("overwrite").parquet(s"$outDir/scores.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "modeldir.txt"), mdir + "\n")
    spark.stop()
    sys.exit(0)
  }
}
