package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch event-stream operators over `events` (the streaming variants live
  * in graft.streaming and share these transformations). All aggregations
  * partition by (window/user) keys — a single hash shuffle each, with
  * map-side partial aggregation.
  */
object EventOps {
  import Tables.table

  // --- q_events_hourly: tumbling-window aggregation ----------------------
  // n_users via distinct-first double aggregation instead of
  // countDistinct: avoids the Expand operator (which duplicates every
  // input row per aggregate path) — two narrow shuffles beat one doubled
  // shuffle at every scale.
  private def qHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .withColumn("hour", date_trunc("hour", col("ts")).cast(TimestampNTZType))
    val base = e.groupBy(col("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    val users = e.select(col("hour"), col("event_type"), col("user_id")).distinct()
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    base.join(users, Seq("hour", "event_type"))
  }

  private val qHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  // --- q_sessionize: 30-minute-gap sessionization ------------------------
  // lag window per user → gap flags → per-user session/event counts.
  // Timestamps are compared as exact epoch-seconds doubles (micros are
  // exactly representable), identical to DuckDB's epoch().
  private def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val secs = col("ts").cast(TimestampType).cast(DoubleType)
    val gap = secs - lag(secs, 1).over(w)
    table(spark, dir, "events")
      .withColumn("new_session",
        when(gap.isNull || gap > 1800.0, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  private val qSessionizeSql =
    """SELECT user_id, SUM(new_session)::BIGINT AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800.0
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events) t
      |GROUP BY user_id""".stripMargin

  // --- q_json_props: semi-structured JSON extraction ---------------------
  private def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  private val qJsonPropsSql =
    """SELECT event_type, COUNT(*) AS n,
      |  SUM(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
      |  MIN(json_extract_string(props, '$.k')::BIGINT) AS min_k,
      |  MAX(json_extract_string(props, '$.k')::BIGINT) AS max_k
      |FROM events
      |GROUP BY event_type""".stripMargin

  // --- q_retention: day-grain cohort retention matrix --------------------
  // The product-analytics staple: users bucketed by first-seen day, then
  // for each (cohort_day, days_since) the count of users active that day.
  // Every stage is narrow and linear: distinct (user, day) partial-
  // aggregates map-side; the cohort min and the join share the user_id
  // key (one exchange each, AQE co-plans them); the final rows are
  // already unique per (user, days_since), so a plain COUNT(*) IS the
  // distinct-user count — no countDistinct, no Expand.
  private def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val activity = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cohort = activity.groupBy(col("user_id")).agg(min(col("d")).as("cohort_date"))
    activity.join(cohort, "user_id")
      .select(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast(LongType).as("days_since"))
      .groupBy(col("cohort_date"), col("days_since"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val qRetentionSql =
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, MIN(d) AS cohort_date FROM a GROUP BY 1)
      |SELECT cohort_date, date_diff('day', cohort_date, d) AS days_since,
      |  COUNT(*) AS n_users
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // --- q_hourly_anomaly: z-score outliers over hourly event volumes ------
  // Monitoring staple: flag hours whose event count deviates > 2σ from
  // that event type's mean hourly volume. Cross-engine determinism
  // argument: the moments are INTEGER sums (n, Σx, Σx²) — exact in both
  // engines — and mean/variance/z follow in a fixed double expression
  // tree of exactly-rounded IEEE ops (+,−,×,÷,sqrt are all correctly
  // rounded per IEEE-754, so identical trees give identical bits; only
  // REASSOCIATED sums and libm transcendentals diverge, and there are
  // none here). Two narrow aggs: hourly counts, then per-type moments —
  // value-domain-sized, broadcast back.
  private def qHourlyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = table(spark, dir, "events")
      .withColumn("hour", date_trunc("hour", col("ts")).cast(TimestampNTZType))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .withColumn("mean", col("s1").cast(DoubleType) / col("n_hours").cast(DoubleType))
      .withColumn("variance",
        (col("s2").cast(DoubleType) - col("s1").cast(DoubleType) * col("mean"))
          / col("n_hours").cast(DoubleType))
      .select(col("event_type"), col("n_hours"), col("mean"), col("variance"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z",
        (col("cnt").cast(DoubleType) - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.0)
      .select(col("event_type"), col("hour"), col("cnt"), col("mean"), col("z"))
  }

  private val qHourlyAnomalySql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, COUNT(*) AS n_hours,
      |    CAST(SUM(cnt) AS BIGINT) AS s1,
      |    CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      |  FROM hourly GROUP BY 1),
      |m AS (
      |  SELECT event_type, n_hours, s1::DOUBLE / n_hours AS mean,
      |    (s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n_hours)) / n_hours AS variance
      |  FROM stats)
      |SELECT event_type, hour, cnt, mean,
      |  (cnt::DOUBLE - mean) / sqrt(variance) AS z
      |FROM hourly JOIN m USING (event_type)
      |WHERE abs((cnt::DOUBLE - mean) / sqrt(variance)) > 2.0""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_hourly_anomaly", qHourlyAnomaly, Some(qHourlyAnomalySql)),
    QueryDef("q_retention", qRetention, Some(qRetentionSql)),
    QueryDef("q_events_hourly", qHourly, Some(qHourlySql), headline = true),
    QueryDef("q_sessionize", qSessionize, Some(qSessionizeSql), headline = true),
    QueryDef("q_json_props", qJsonProps, Some(qJsonPropsSql)))
}
