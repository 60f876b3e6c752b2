package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed INTERVAL (range) join — the join type the rest of the suite
  * lacks in batch form: probe rows matched to every interval that
  * CONTAINS them, with no equality key between the two sides.
  *
  * Naively `a JOIN b ON b.lo <= a.x AND a.x < b.hi` plans as a nested-loop
  * cartesian — the classic 100 TB scale-killer. The standard distributed
  * answer, implemented here: quantize the domain into fixed buckets,
  * EXPLODE each interval into the buckets it covers (intervals here span
  * ≤ 22 days over 16-day buckets → ≤ 3 rows each), compute each probe
  * row's single bucket, and equi-join on the bucket with the range
  * predicate left as a residual filter. The plan becomes a
  * BroadcastHashJoin (build side is bounded: priorities × quarters), the
  * probe side is never replicated beyond its single bucket row, and each
  * probe partition scans only candidate intervals sharing its bucket.
  * With an unbounded build side the identical shape works as a
  * shuffled hash join on the bucket key.
  *
  * Fixture semantics ("campaign attribution"): for every (order priority,
  * quarter) cohort, a campaign window opens at the cohort's first order
  * and runs 7 + 3·priority_rank days; every order (of ANY priority)
  * placed inside a window is attributed to that campaign — genuinely
  * many-to-many, windows overlap across priorities.
  *
  * Determinism: all interval arithmetic in integer epoch-day space;
  * revenue through the repo's DECIMAL(18,2) exact-sum discipline.
  */
object RangeJoinOps {
  import Tables.table

  /** Bucket width in days; ≥ the longest interval (22d) would guarantee
    * ≤ 2 buckets per interval — 16 keeps ≤ 3 and exercises multi-bucket
    * coverage. */
  private val BucketDays = 16

  private def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("priority"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .cast(LongType).as("yq"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast(LongType).as("ds"),
        col("o_totalprice"))
    // bounded build side: one interval per (priority, quarter) cohort
    val camp = o.groupBy(col("priority"), col("yq"))
      .agg(min(col("ds")).as("s_day"))
      .withColumn("len_days",
        lit(7L) + lit(3L) * substring(col("priority"), 1, 1).cast(LongType))
    val campBuckets = camp.select(
      col("priority").as("c_priority"), col("yq").as("c_yq"),
      col("s_day"), col("len_days"),
      explode(sequence(
        expr(s"s_day div $BucketDays"),
        expr(s"(s_day + len_days - 1) div $BucketDays"))).as("bucket"))
    val probe = o.select(col("ds"), col("o_totalprice"))
      .withColumn("bucket", expr(s"ds div $BucketDays"))
    probe.join(broadcast(campBuckets), Seq("bucket"))
      .filter(col("ds") >= col("s_day") &&
        col("ds") < col("s_day") + col("len_days"))
      .groupBy(col("c_priority"), col("c_yq"))
      .agg(
        first(col("s_day")).as("s_day"),
        first(col("len_days")).as("len_days"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"))
      .withColumnRenamed("c_priority", "priority")
      .withColumnRenamed("c_yq", "yq")
  }

  private val qRangeJoinSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 4
      |      + quarter(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS yq,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS ds,
      |    o_totalprice
      |  FROM orders),
      |c AS (
      |  SELECT priority, yq, MIN(ds) AS s_day,
      |    7 + 3 * CAST(substring(priority, 1, 1) AS BIGINT) AS len_days
      |  FROM o GROUP BY 1, 2, 4)
      |SELECT c.priority, c.yq, ANY_VALUE(c.s_day) AS s_day,
      |  ANY_VALUE(c.len_days) AS len_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM c JOIN o ON o.ds >= c.s_day AND o.ds < c.s_day + c.len_days
      |GROUP BY 1, 2""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinSql)))
}
