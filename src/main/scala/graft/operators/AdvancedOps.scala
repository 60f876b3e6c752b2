package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Advanced relational surface beyond the reference: rollup subtotals,
  * pivot, having, exact median, as-of join, funnel analysis. Each is the
  * Spark-idiomatic composition (no custom physical operators needed —
  * SURVEY §4.2 holds for these too) with a DuckDB oracle.
  */
object AdvancedOps {
  import Tables.table

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // --- q6_revenue_forecast: TPC-H Q6 shape (filter + single agg) ---------
  private def q6(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType)
        && col("l_shipdate") < lit("1997-01-01").cast(TimestampType)
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast(DoubleType).as("revenue"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // --- q_rollup_revenue: ROLLUP subtotals --------------------------------
  private def qRollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))

  private val qRollupSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // --- q_pivot_status: segment × order-status pivot ----------------------
  // customer grows with the data — no broadcast hint; stats+AQE still pick
  // broadcast at bench SFs, and revert to shuffle join beyond the
  // threshold. Pivot yields NULL for an absent (segment, status) combo
  // where the oracle's COUNT FILTER yields 0 → fill with 0.
  private def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    table(spark, dir, "orders")
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
  }

  private val qPivotSql =
    """SELECT c_mktsegment,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS F,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS O,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS P
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // --- q_big_spenders: HAVING over grouped agg (TPC-H Q18 shape) ---------
  private def qHaving(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).cast(DoubleType).as("total_qty"))
      .filter(col("total_qty") > 120)

  private val qHavingSql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem GROUP BY l_orderkey
      |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120""".stripMargin

  // --- q_median_price: exact median via grouped cumulative counts --------
  // Built-in percentile interpolation differs in FP op order across
  // engines; an explicit lo/hi-rank average in DECIMAL is exact and
  // engine-agnostic. Median ranks: lo = (n+1) div 2, hi = (n+2) div 2.
  //
  // Scale shape: a row_number window over raw lineitem would sort the
  // whole fact table inside 3 returnflag partitions — a single-reducer
  // straggler at any scale. Aggregating to (flag, price, cnt) FIRST makes
  // the window input bounded by the price value-domain (2-decimal money —
  // constant in corpus size), with map-side combine doing the heavy
  // lifting; the rank-lookup then reads cumulative counts.
  private def qMedian(spark: SparkSession, dir: String): DataFrame = {
    val g = table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), dec2(col("l_extendedprice")).as("price"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    val hits =
      when(expr("(n + 1) div 2").between(col("cum") - col("cnt") + 1, col("cum")), 1).otherwise(0) +
      when(expr("(n + 2) div 2").between(col("cum") - col("cnt") + 1, col("cum")), 1).otherwise(0)
    g.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("hits", hits)
      .filter(col("hits") > 0)
      .groupBy(col("l_returnflag"))
      .agg((sum(col("price") * col("hits")).cast(DoubleType) / sum(col("hits")))
        .as("median_price"))
  }

  private val qMedianSql =
    """WITH g AS (
      |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT l_returnflag, price, cnt,
      |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY price
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
      |  FROM g),
      |h AS (
      |  SELECT l_returnflag, price,
      |    (CASE WHEN (n+1)//2 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END)
      |    + (CASE WHEN (n+2)//2 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END) AS hits
      |  FROM r)
      |SELECT l_returnflag, CAST(SUM(price * hits) AS DOUBLE) / SUM(hits) AS median_price
      |FROM h WHERE hits > 0 GROUP BY l_returnflag""".stripMargin

  // --- q_asof_last_view: as-of join via ignore-nulls window --------------
  // "For each click/purchase, the most recent preceding view by the same
  // user" — the as-of-join semantics, composed from last(ignoreNulls)
  // over an event-time window (preference (a): built-in composition,
  // SURVEY §7.3). One shuffle on user_id; no range cross-product.
  private def qAsOf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    table(spark, dir, "events")
      .withColumn("prev_view_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("event_type"), col("user_id"), col("prev_view_id"))
  }

  private val qAsOfSql =
    """SELECT event_id, event_type, user_id, prev_view_id FROM (
      |  SELECT event_id, event_type, user_id,
      |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_id
      |  FROM events) t
      |WHERE event_type IN ('click', 'purchase')""".stripMargin

  // --- q_funnel: view → click → purchase completion per user -------------
  // Single-shuffle formulation: one hash exchange on user_id, then three
  // chained whole-partition windows (no orderBy → no sort) compute the
  // sequential step times, and the final groupBy reuses the same
  // partitioning (no second exchange). The per-user step cardinality is
  // O(|users|) — unbounded — so nothing here is broadcast; at cluster
  // scale this stays one shuffle of the event stream.
  private def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .filter(col("t_view").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("t_view"),
        min(col("t_click")).as("t_click"),
        min(col("t_purchase")).as("t_purchase"))
  }

  private val qFunnelSql =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type='view' GROUP BY 1),
      |c AS (SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type='click' AND e.ts > v.t_view GROUP BY 1, 2),
      |p AS (SELECT e.user_id, c.t_view, c.t_click, MIN(e.ts) AS t_purchase
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type='purchase' AND e.ts > c.t_click GROUP BY 1, 2, 3)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      |FROM v
      |LEFT JOIN (SELECT user_id, t_click FROM c) c ON v.user_id = c.user_id
      |LEFT JOIN (SELECT user_id, t_purchase FROM p) p ON v.user_id = p.user_id""".stripMargin

  // --- q_topk_per_group: custom bounded-buffer Aggregator ----------------
  // Exact top-3 orders per customer through graft.functions.TopKAggregator
  // (typed Aggregator with k-bounded partial state — map-side combine
  // ships ≤k rows per group per partition, unlike the window-rank
  // formulation which shuffles every row). Oracle: the equivalent
  // ROW_NUMBER window — results must agree exactly.
  private def qTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TopKAggregator
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(v => (v._2, v._3))
      .agg(new TopKAggregator(3).toColumn.name("topk"))
      .flatMap { case (custkey, topk) =>
        topk.zipWithIndex.map { case ((price, orderkey), i) =>
          (custkey, orderkey, price, (i + 1).toLong)
        }
      }
      .toDF("custkey", "orderkey", "totalprice", "rank")
  }

  private val qTopKAggSql =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |       o_totalprice AS totalprice, rn AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // --- q7_nation_volume: nation-pair shipping volume by year -------------
  private def q7(spark: SparkSession, dir: String): DataFrame = {
    val n1 = table(spark, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = table(spark, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      // supplier/customer grow with the data — leave them to stats+AQE
      // (they still broadcast at bench SFs); nation is bounded (25 rows)
      // so its hint is safe at any scale
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("volume"))
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name != n2.n_name
      |GROUP BY 1, 2, 3""".stripMargin

  // --- q12_priority_by_status: conditional CASE aggregation (Q12 shape) --
  private def q12(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_count"))

  private val q12Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // --- q14_promo_revenue: conditional ratio (Q14 shape) ------------------
  // Ratio computed from exact decimal sums cast to double, so the single
  // final division is the only FP op — identical in both engines.
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    table(spark, dir, "lineitem")
      // part is ~20% of lineitem cardinality — never hint-broadcast it
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType) * 100.0
          / sum(rev).cast(DoubleType)).as("promo_revenue_pct"))
  }

  private val q14Sql =
    """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q7_nation_volume", q7, Some(q7Sql)),
    QueryDef("q12_priority_by_status", q12, Some(q12Sql)),
    QueryDef("q14_promo_revenue", q14, Some(q14Sql)),
    QueryDef("q_topk_per_group", qTopKAgg, Some(qTopKAggSql)),
    QueryDef("q6_revenue_forecast", q6, Some(q6Sql)),
    QueryDef("q_rollup_revenue", qRollup, Some(qRollupSql)),
    QueryDef("q_pivot_status", qPivot, Some(qPivotSql)),
    QueryDef("q_big_spenders", qHaving, Some(qHavingSql)),
    QueryDef("q_median_price", qMedian, Some(qMedianSql)),
    QueryDef("q_asof_last_view", qAsOf, Some(qAsOfSql), headline = true),
    QueryDef("q_funnel", qFunnel, Some(qFunnelSql), headline = true))
}
