package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (100-TB design tool):
  * writing both sides of a recurring fact-fact join bucketed (and sorted)
  * by the join key lets every subsequent join run shuffle-free — the
  * Exchange disappears from the plan because the table layout already
  * satisfies the join's distribution requirement.
  *
  * Use for the joins that repeat every pipeline run (orders⋈lineitem by
  * orderkey); the one-time shuffle at write amortizes across reads.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketKey: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .saveAsTable(tableName)

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** True iff the physical plan contains a shuffle exchange — the
    * assertion tool for "this join is co-located". Scans the printed plan
    * tree because the AdaptiveSparkPlan wrapper hides its inner plan from
    * a node-type walk. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
