package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling operator: per-column summary statistics for any table —
  * the quality-report shape an ETL pipeline runs after every load (the
  * reference's reconciliation check generalized from row counts to
  * per-column health). One scan computes all columns' stats (a single
  * aggregate node, no per-column jobs); the per-column rows are unpivoted
  * from that one aggregation.
  */
object ProfileOps {
  import Tables.table

  /** Profile: (column, n, n_null, n_distinct, min_s, max_s) per column.
    * min/max rendered as strings so heterogeneous column types fit one
    * deterministic schema (numeric rendering mirrored in the oracle by
    * matching the type formatting). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // counts/nulls/min/max for ALL columns in one scan-and-agg pass —
    // deliberately WITHOUT countDistinct, whose multi-column form plans
    // an Expand that duplicates every input row per profiled column
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    // exact distincts as per-column two-phase aggs: map-side partial
    // distinct means each shuffles only the column's distinct values —
    // Σ|distinct(c)| rows moved vs Expand's |rows|×|cols|
    val distincts = cols.map { c =>
      df.select(col(c)).filter(col(c).isNotNull).distinct()
        .agg(count(lit(1)).as(s"${c}__distinct"))
    }
    val wide = (df.agg(aggs.head, aggs.tail: _*) +: distincts).reduce(_.crossJoin(_))
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  // --- q_profile_orders: profile the orders table ------------------------
  // String-typed columns only in the oracle-checked projection of min/max
  // (numeric-to-string rendering differs between engines: Spark "1.0" vs
  // DuckDB "1.0" agree for ints/strings; doubles are excluded from min/max
  // string compare and checked via counts instead).
  private val ProfCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  private def qProfile(spark: SparkSession, dir: String): DataFrame =
    profile(table(spark, dir, "orders"), ProfCols)

  private val qProfileSql = ProfCols.map { c =>
    s"""SELECT '$c' AS column, COUNT(*) AS n,
       |  COUNT(*) FILTER ($c IS NULL) AS n_null,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(MIN($c) AS VARCHAR) AS min_s,
       |  CAST(MAX($c) AS VARCHAR) AS max_s
       |FROM orders""".stripMargin
  }.mkString("", "\nUNION ALL\n", "")

  // --- q_histogram: fixed-width price histogram --------------------------
  // Distribution profiling beyond min/max: $5,000 bins over
  // l_extendedprice. The money column is pre-rounded to 2 decimals, so
  // cents = round(price·100) is integer-exact in both engines and the bin
  // arithmetic stays BIGINT. One wordcount-shaped agg (map-side combine,
  // output bounded by the value domain / bin width, not the corpus).
  private val BinCents = 500000L

  private def qHistogram(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
      .groupBy(expr(s"cents div $BinCents").as("bin"))
      .agg(count(lit(1)).as("n_items"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .withColumn("bin_lo_cents", col("bin") * BinCents)
      .select(col("bin"), col("bin_lo_cents"), col("n_items"),
        col("min_cents"), col("max_cents"))

  private val qHistogramSql =
    s"""SELECT bin, bin * $BinCents AS bin_lo_cents, COUNT(*) AS n_items,
       |  MIN(cents) AS min_cents, MAX(cents) AS max_cents
       |FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // $BinCents AS bin,
       |             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
       |      FROM lineitem) t
       |GROUP BY bin""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_histogram", qHistogram, Some(qHistogramSql)),
    QueryDef("q_profile_orders", qProfile, Some(qProfileSql)))
}
