package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Functions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked end-to-end exercises of the reference scalar-function
  * library (SURVEY §2.8 F1/F3/F5/F6). Inputs are derived deterministically
  * from the testdata (the tables carry no Oracle-formatted strings), then
  * run through the real `graft.functions.Functions` implementations; the
  * DuckDB oracle computes the expected values independently.
  */
object FunctionQueries {
  import Tables.table

  // --- q_strip: F1 on decorated document text ----------------------------
  // Decorate a text prefix with the junk strip() exists to remove:
  // leading newline, embedded quotes, trailing CR. Every 50th doc becomes
  // a bare quoted-empty string, which must strip to NULL.
  private def qStrip(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val decorated = when(col("doc_id") % 50 === 0, lit("\"\""))
      .otherwise(concat(lit("\n\""), substring(col("text"), 1, 30), lit("\"\r")))
    d.select(
      col("doc_id"),
      Functions.strip(decorated).as("stripped"))
  }

  private val qStripSql =
    """SELECT doc_id,
      |  NULLIF(regexp_replace(
      |    CASE WHEN doc_id % 50 = 0 THEN chr(34) || chr(34)
      |         ELSE chr(10) || chr(34) || substring(text, 1, 30) || chr(34) || chr(13) END,
      |    '(^[\n\r]+)|(")|([\n\r]+$)', '', 'g'), '') AS stripped
      |FROM documents""".stripMargin

  // --- q_parse_date: F6 round-trip through `01-FEB-19` shape -------------
  // parse_date resolves 2-digit years into the current century (2000+yy,
  // Postgres YY semantics), so 1995 source dates parse to 2095 — the oracle
  // computes that expectation directly.
  private def qParseDate(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val s = upper(date_format(col("o_orderdate"), "dd-MMM-yy"))
    o.select(
      col("o_orderkey"),
      s.as("formatted"),
      Functions.parseDate(s).as("parsed"))
  }

  private val qParseDateSql =
    """SELECT o_orderkey,
      |  upper(strftime(o_orderdate, '%d-%b-%y')) AS formatted,
      |  make_date((2000 + year(o_orderdate) % 100)::INT, month(o_orderdate)::INT, day(o_orderdate)::INT) AS parsed
      |FROM orders""".stripMargin

  // --- q_parse_timestamp: F3 all three branch families -------------------
  // Build each documented shape (hooks/functions.sql:39-43) from events.ts,
  // parse with the real dispatch, compare against directly-computed UTC
  // instants. Offset branch: wall time labelled +01:00 → UTC = wall - 1h.
  private def qParseTs(spark: SparkSession, dir: String): DataFrame = {
    // 4 multi-branch parses per row, all pre-shuffle — map-bound
    // (Tables.fanOut: one row group = one core without it)
    val e = Tables.fanOut(table(spark, dir, "events"))
    val ts = col("ts")
    val sOffset  = concat(upper(date_format(ts, "dd-MMM-yy hh.mm.ss a")), lit(" +01:00"))
    val sNamed   = concat(upper(date_format(ts, "dd-MMM-yy hh.mm.ss.SSSSSSSSS a")), lit(" GMT"))
    val sCompact = concat(date_format(ts, "yyyyMMddHHmmss"), lit("+0130"))
    e.select(
      col("event_id"),
      Functions.parseTimestamp(sOffset).cast(TimestampNTZType).as("parsed_offset"),
      Functions.parseTimestamp(sNamed).cast(TimestampNTZType).as("parsed_named"),
      Functions.parseTimestamp(sCompact).cast(TimestampNTZType).as("parsed_compact"),
      Functions.parseTimestamp(col("event_type")).cast(TimestampNTZType).as("parsed_garbage"))
  }

  private val qParseTsSql =
    """SELECT event_id,
      |  date_trunc('second', ts) - INTERVAL 1 HOUR AS parsed_offset,
      |  ts AS parsed_named,
      |  date_trunc('second', ts) - INTERVAL 90 MINUTE AS parsed_compact,
      |  CAST(NULL AS TIMESTAMP) AS parsed_garbage
      |FROM events""".stripMargin

  // --- q_parse_timezone: F5 named-zone token extraction ------------------
  private def qParseTz(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
    val sNamed  = concat(upper(date_format(col("ts"), "dd-MMM-yy hh.mm.ss a")), lit(" GMT"))
    val sOffset = concat(upper(date_format(col("ts"), "dd-MMM-yy hh.mm.ss a")), lit(" +01:00"))
    e.select(
      col("event_id"),
      Functions.parseTimezone(sNamed).as("tz_named"),
      Functions.parseTimezone(sOffset).as("tz_missing"))
  }

  private val qParseTzSql =
    """SELECT event_id,
      |  NULLIF(regexp_extract(upper(strftime(ts, '%d-%b-%y %I.%M.%S %p')) || ' GMT',
      |    '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.?\d{0,9} (?:AM|PM) (\w\w\w)', 1), '') AS tz_named,
      |  NULLIF(regexp_extract(upper(strftime(ts, '%d-%b-%y %I.%M.%S %p')) || ' +01:00',
      |    '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.?\d{0,9} (?:AM|PM) (\w\w\w)', 1), '') AS tz_missing
      |FROM events""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_strip", qStrip, Some(qStripSql)),
    QueryDef("q_parse_date", qParseDate, Some(qParseDateSql)),
    QueryDef("q_parse_timestamp", qParseTs, Some(qParseTsSql)),
    QueryDef("q_parse_timezone", qParseTz, Some(qParseTzSql)))
}
