package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout for time-series facts (events at
  * 100 TB): writing `partitionBy(date)` turns every time-range query into
  * a partition-pruned scan — the scan touches only matching directories,
  * which is the difference between reading a day and reading a year.
  */
object PartitionedLayout {

  /** Write events partitioned by event date (derived column kept out of
    * the payload via partitionBy). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True iff the scan prunes partitions (PartitionFilters non-empty) —
    * plan-level assertion that a date filter never touches other days. */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []")
  }
}
