package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface: scan/count (SURVEY §2.1 S7/A1), union combine
  * (§2.7 U1), typed projection (§2.2 P3), count reconciliation (§2.3/§2.4),
  * plus the analytics extensions (joins, windows, top-k) the reference
  * delegates to Postgres.
  *
  * Determinism discipline for the DuckDB oracle compare:
  *  - SUM/AVG over doubles goes through DECIMAL(18,2/4) on both sides —
  *    source values are generated pre-rounded, so the decimal cast is exact
  *    and the aggregate is order-independent; final cast back to double.
  *  - every LIMIT/top-k has a total tie-breaking ORDER BY.
  */
object Relational {
  import Tables.table

  /** Exact money arithmetic: values are pre-rounded to 2 decimals. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // --- q1_pricing_summary: TPC-H Q1-shaped scan+agg on lineitem ----------
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
    val sumQty   = sum(dec2(col("l_quantity"))).cast(DoubleType)
    val sumBase  = sum(dec2(col("l_extendedprice"))).cast(DoubleType)
    val sumDisc  = sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast(DoubleType)
    val sumChrg  = sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
      * (lit(1) + dec2(col("l_tax")))).cast(DoubleType)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumQty.as("sum_qty"),
        sumBase.as("sum_base_price"),
        sumDisc.as("sum_disc_price"),
        sumChrg.as("sum_charge"),
        (sumQty / count(lit(1))).as("avg_qty"),
        (sumBase / count(lit(1))).as("avg_price"),
        (sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // --- q_count_per_table: per-table row counts (S7/A1 + reconciliation
  //     ledger shape, reference main.py:253-261) --------------------------
  private def qCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.All.map { t =>
      table(spark, dir, t).agg(count(lit(1)).as("cnt")).select(lit(t).as("tbl"), col("cnt"))
    }.reduce(_.unionAll(_))

  private val qCountsSql = Tables.All
    .map(t => s"SELECT '$t' AS tbl, COUNT(*) AS cnt FROM $t")
    .mkString("", " UNION ALL ", "")

  // --- q_reconciliation: expected-vs-actual count join (main.py:274-299:
  //     dict-join of csv counts vs db counts with abs delta) --------------
  private def qReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val expected = table(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("expected_cnt"))
    // distinct BEFORE the join: shrink lineitem to unique orderkeys first
    // (one narrow-column shuffle), then count per customer — vs
    // countDistinct after the join, which shuffles the full join output
    // and pays an expand. Same result, ~2× cheaper at every scale.
    val actual = table(spark, dir, "lineitem")
      .select(col("l_orderkey")).distinct()
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("actual_cnt"))
    expected.join(actual, Seq("custkey"), "full_outer")
      .select(
        col("custkey"),
        coalesce(col("expected_cnt"), lit(0L)).as("expected_cnt"),
        coalesce(col("actual_cnt"), lit(0L)).as("actual_cnt"),
        abs(coalesce(col("expected_cnt"), lit(0L)) - coalesce(col("actual_cnt"), lit(0L))).as("delta"))
  }

  private val qReconciliationSql =
    """SELECT custkey,
      |  COALESCE(expected_cnt, 0) AS expected_cnt,
      |  COALESCE(actual_cnt, 0) AS actual_cnt,
      |  ABS(COALESCE(expected_cnt, 0) - COALESCE(actual_cnt, 0)) AS delta
      |FROM (SELECT o_custkey AS custkey, COUNT(*) AS expected_cnt FROM orders GROUP BY 1) e
      |FULL OUTER JOIN (
      |  SELECT o_custkey AS custkey2, COUNT(DISTINCT l_orderkey) AS actual_cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1) a
      |ON e.custkey = a.custkey2""".stripMargin

  // --- q_union_combine: U1 n-ary UNION ALL combine (main.py:215-248) -----
  private def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
    p.filter(col("p_size") < 25).unionAll(p.filter(col("p_size") >= 25))
  }

  private val qUnionSql =
    "SELECT * FROM part WHERE p_size < 25 UNION ALL SELECT * FROM part WHERE p_size >= 25"

  // --- q_typed_projection: P3 text→typed casts (README.md:96-105 shape) --
  private def qTyped(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
    // round-trip through strings: the all-text import representation
    p.select(
      col("p_partkey").cast(StringType).cast(LongType).as("partkey"),
      col("p_name").as("name"),
      col("p_size").cast(StringType).cast(IntegerType).as("size"))
  }

  private val qTypedSql =
    """SELECT CAST(CAST(p_partkey AS VARCHAR) AS BIGINT) AS partkey,
      |       p_name AS name,
      |       CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size
      |FROM part""".stripMargin

  // --- q_setops: INTERSECT / EXCEPT over nation keys ---------------------
  private def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val s = table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(s).withColumn("op", lit("both"))
      .unionAll(c.except(s).withColumn("op", lit("customer_only")))
  }

  private val qSetOpsSql =
    """SELECT nationkey, 'both' AS op FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier) t
      |UNION ALL
      |SELECT nationkey, 'customer_only' AS op FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier) t""".stripMargin

  // --- q_mktsegment_revenue: broadcast dim join + agg --------------------
  private def qMkt(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val o = table(spark, dir, "orders")
    // customer grows with the data — no forced broadcast hint; Spark's
    // stats + AQE pick broadcast while it fits and shuffle join beyond
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("revenue"))
  }

  private val qMktSql =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // --- q3_shipping_priority: 3-way join + agg + deterministic top-k ------
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast(TimestampType)
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = table(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = table(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- q5_region_revenue: 6-way star join, group by nation ---------------
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    val r = table(spark, dir, "region")
    val n = table(spark, dir, "nation")
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    // customer/supplier are unbounded — planner-chosen joins only; nation
    // (25 rows) and region (5 rows) stay hinted: safe at any scale
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
  }

  private val q5Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // --- q_top_orders: deterministic top-k ---------------------------------
  private def qTop(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val qTopSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // --- q_window_rank: row_number window, top-3 orders per customer -------
  private def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  private val qWindowSql =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // --- q_running_revenue: frame-bounded running-sum window ---------------
  // Exact-decimal running total per customer over order history; total
  // order (date, orderkey) makes the cumulative frame deterministic.
  private def qRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
  }

  private val qRunningSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_running_revenue", qRunning, Some(qRunningSql)),
    QueryDef("q1_pricing_summary", q1, Some(q1Sql), headline = true),
    QueryDef("q_count_per_table", qCounts, Some(qCountsSql)),
    QueryDef("q_reconciliation", qReconciliation, Some(qReconciliationSql), headline = true),
    QueryDef("q_union_combine", qUnion, Some(qUnionSql)),
    QueryDef("q_typed_projection", qTyped, Some(qTypedSql)),
    QueryDef("q_setops", qSetOps, Some(qSetOpsSql)),
    QueryDef("q_mktsegment_revenue", qMkt, Some(qMktSql), headline = true),
    QueryDef("q3_shipping_priority", q3, Some(q3Sql), headline = true),
    QueryDef("q5_region_revenue", q5, Some(q5Sql), headline = true),
    QueryDef("q_top_orders", qTop, Some(qTopSql)),
    QueryDef("q_window_rank", qWindow, Some(qWindowSql)))
}
