package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's scalar-function library, re-expressed as Spark
  * `Column` compositions (codegen-friendly — no UDF in the hot path).
  *
  * Reference: /root/reference/postgresimporter/hooks/functions.sql:1-65
  * (registered after every import run, main.py:203-208). Semantics are
  * reproduced faithfully, including NULL-on-no-match and empty→NULL.
  *
  * All functions assume session time zone UTC (build.sbt sets
  * `spark.sql.session.timeZone=UTC`), matching Postgres timestamptz
  * normalization to UTC.
  */
object Functions {

  // ---------------------------------------------------------------------
  // F1: strip(text) → text
  // hooks/functions.sql:1-5 — strip leading/trailing CR/LF, remove ALL
  // double-quotes, empty→NULL, NULL-in→NULL-out.
  // ---------------------------------------------------------------------
  val StripRegex = "(^[\\n\\r]+)|(\")|([\\n\\r]+$)"

  def strip(c: Column): Column =
    nullif(regexp_replace(c, StripRegex, ""), lit(""))

  // ---------------------------------------------------------------------
  // Month-name handling shared by the parse_* family.
  // Postgres `MON` tokens are case-insensitive; Java's DateTimeFormatter is
  // not, so we decode month names with an explicit when-chain instead of
  // relying on to_timestamp pattern parsing.
  // ---------------------------------------------------------------------
  private val MonthNames =
    Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
        "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")

  /** 3-letter month token (any case) → 1..12; unknown → NULL. */
  def monthNumber(mon: Column): Column = {
    val up = upper(mon)
    MonthNames.zipWithIndex.foldLeft(lit(null).cast(IntegerType)) {
      case (acc, (name, idx)) => when(up === name, lit(idx + 1)).otherwise(acc)
    }
  }

  // Field-extraction pattern for the `31-JAN-19 03.20.00[.123456789] PM <zone>`
  // shapes (hooks/functions.sql:39-42). Groups:
  //   1=dd 2=mon 3=yy 4=hh12 5=mi 6=ss 7=nanos(opt) 8=AM/PM 9=zone tail
  private val OracleTsPattern =
    "^(\\d\\d)-(\\w\\w\\w)-(\\d\\d) (\\d\\d)\\.(\\d\\d)\\.(\\d\\d)(?:\\.(\\d{1,9}))? (AM|PM) (.+)$"

  /** regexp_extract returns "" on no-match; Postgres semantics want NULL. */
  private def extr(c: Column, pattern: String, group: Int): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** Build a wall-clock timestamp from the Oracle-style fields of `c`,
    * then reinterpret that wall time in zone `zone` and convert to UTC.
    * Fractional seconds are truncated to micros (Spark's precision; the
    * reference's nanos are always `.000000000` in the documented shapes,
    * hooks/functions.sql:39-43).
    */
  private def oracleFieldsToUtc(c: Column, zone: Column): Column = {
    val dd   = extr(c, OracleTsPattern, 1).cast(IntegerType)
    val mon  = monthNumber(extr(c, OracleTsPattern, 2))
    // Postgres YY resolves into the current century: '19' → 2019.
    val yyyy = extr(c, OracleTsPattern, 3).cast(IntegerType) + lit(2000)
    val hh12 = extr(c, OracleTsPattern, 4).cast(IntegerType)
    val mi   = extr(c, OracleTsPattern, 5).cast(IntegerType)
    val ss   = extr(c, OracleTsPattern, 6)
    val frac = coalesce(substring(regexp_extract(c, OracleTsPattern, 7), 1, 6), lit("0"))
    val ampm = extr(c, OracleTsPattern, 8)
    val hh24 = (hh12 % 12) + when(ampm === "PM", 12).otherwise(0)
    val secs = concat(ss, lit("."), when(frac === "", "0").otherwise(frac))
      .cast(DecimalType(16, 6))
    // try_: out-of-range fields → NULL instead of an ANSI runtime error
    // (Postgres to_timestamp would raise; NULL is the safe batch choice at
    // scale and matches the function family's NULL-on-no-match contract).
    val wall = try_make_timestamp(yyyy, mon, dd, hh24, mi, secs)
    to_utc_timestamp(wall, zone)
  }

  // ---------------------------------------------------------------------
  // F5: parse_timezone(text) → text
  // hooks/functions.sql:31-36 — extract the 3-letter named zone token.
  // Dots in the reference regex are unescaped (match any char); preserved.
  // ---------------------------------------------------------------------
  val ParseTimezoneRegex =
    "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.?\\d{0,9} (?:AM|PM) (\\w\\w\\w)"

  def parseTimezone(c: Column): Column =
    nullif(regexp_extract(c, ParseTimezoneRegex, 1), lit(""))

  // ---------------------------------------------------------------------
  // F4: parse_timestamp_with_tz(text, tz) → timestamptz
  // hooks/functions.sql:24-29 — interpret the wall time in named zone `tz`,
  // render in the session zone (UTC). The reference's middle `fmt` argument
  // is always one of the two Oracle shapes our extractor covers, so the
  // format is implied by the value here.
  // ---------------------------------------------------------------------
  def parseTimestampWithTz(c: Column, tz: Column): Column =
    oracleFieldsToUtc(c, tz)

  // ---------------------------------------------------------------------
  // F3: parse_timestamp(text) → timestamptz — 5-branch dispatch
  // hooks/functions.sql:38-58. Branch regexes preserved verbatim (dots
  // unescaped, unanchored, as in the Postgres source). Unmatched → NULL.
  // ---------------------------------------------------------------------
  private val B1 = "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.\\d\\d\\d\\d\\d\\d\\d\\d\\d (?:AM|PM) (\\+|-)\\d\\d:\\d\\d"
  private val B2 = "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d (?:AM|PM) (\\+|-)\\d\\d:\\d\\d"
  private val B3 = "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.\\d\\d\\d\\d\\d\\d\\d\\d\\d (?:AM|PM) (\\w\\w\\w)"
  private val B4 = "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d (?:AM|PM) (\\w\\w\\w)"
  private val B5 = "\\d\\d\\d\\d\\d\\d\\d\\d\\d\\d\\d\\d\\d\\d(\\+|-)\\d\\d\\d\\d"

  /** `20190101013449+0000` → UTC timestamp (branch 5). */
  private def compactToUtc(c: Column): Column = {
    val yyyy = substring(c, 1, 4).cast(IntegerType)
    val mm   = substring(c, 5, 2).cast(IntegerType)
    val dd   = substring(c, 7, 2).cast(IntegerType)
    val hh   = substring(c, 9, 2).cast(IntegerType)
    val mi   = substring(c, 11, 2).cast(IntegerType)
    val ss   = substring(c, 13, 2).cast(DecimalType(16, 6))
    val zone = concat(substring(c, 15, 3), lit(":"), substring(c, 18, 2))
    to_utc_timestamp(try_make_timestamp(yyyy, mm, dd, hh, mi, ss), zone)
  }

  /** Trailing `+01:00` / `-03:30` offset token of an Oracle-shape string. */
  private val OffsetTail = "((?:\\+|-)\\d\\d:\\d\\d)$"

  /** Native-expression fast path: ONE compiled-pattern match per branch
    * inside whole-stage codegen (see expressions.scala); the Column
    * composition below is the reference-shaped fallback kept for
    * documentation and cross-checking. */
  def parseTimestamp(c: Column): Column =
    column(ParseTimestampExpr(expression(c)))

  /** The original faithful composition of built-ins (semantically equal to
    * parseTimestamp; ~30 regex evaluations per row — don't use in hot
    * paths). */
  def parseTimestampComposed(c: Column): Column =
    when(c.rlike(B1) || c.rlike(B2), oracleFieldsToUtc(c, extr(c, OffsetTail, 1)))
      .when(c.rlike(B3) || c.rlike(B4), oracleFieldsToUtc(c, parseTimezone(c)))
      .when(c.rlike(B5), compactToUtc(c))
      .otherwise(lit(null).cast(TimestampType))

  // ---------------------------------------------------------------------
  // F6: parse_date(text) → date
  // hooks/functions.sql:60-65 — `01-FEB-19` (FXDD-MON-YY), case-insensitive
  // month, NULL on no-match.
  // ---------------------------------------------------------------------
  private val DatePattern = "^(\\d\\d)-(\\w\\w\\w)-(\\d\\d)$"

  /** Native-expression fast path (one compiled-pattern match; NULL on
    * no-match and on invalid dates like 29-FEB-19). */
  def parseDate(c: Column): Column =
    column(ParseDateExpr(expression(c)))

  /** Reference-shaped composition equivalent of parseDate. */
  def parseDateComposed(c: Column): Column = {
    val dd   = extr(c, DatePattern, 1)
    val mon  = monthNumber(extr(c, DatePattern, 2))
    val yyyy = extr(c, DatePattern, 3).cast(IntegerType) + lit(2000)
    // try_to_date on a rebuilt ISO string: invalid dates (29-FEB-19) → NULL
    // instead of an ANSI error, keeping the NULL-on-no-match contract.
    try_to_date(concat(yyyy, lit("-"), mon, lit("-"), dd), "yyyy-M-d")
  }

  // ---------------------------------------------------------------------
  // F2: has_column(schema→ignored, table, column) → boolean
  // hooks/functions.sql:7-13 — catalog introspection. Driver-side in Spark
  // (the catalog is not distributed data); schema arg kept for parity.
  // ---------------------------------------------------------------------
  def hasColumn(spark: SparkSession, table: String, column: String): Boolean =
    spark.catalog.tableExists(table) &&
      spark.catalog.listColumns(table).collect().exists(_.name == column)

  // ---------------------------------------------------------------------
  // Registration (≙ main.py:203-208 running hooks/functions.sql after every
  // import). SQL-callable names for hook scripts; the DataFrame API above
  // remains the codegen'd fast path.
  // ---------------------------------------------------------------------
  /** (name, arity, expression builder) for every SQL-callable function —
    * shared by per-session registration (registerAll) and cluster-wide
    * injection (graft.GraftExtensions via spark.sql.extensions). Builders
    * go through the Column compositions' expression trees, so the
    * SQL-callable functions stay codegen'd (no Scala UDF indirection). */
  lazy val registrations: Seq[(String, Int,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    def entry(name: String, arity: Int)(build: Seq[Column] => Column) =
      (name, arity,
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == arity, s"$name expects $arity argument(s)")
          expression(build(exprs.map(e => column(e))))
        })
    Seq(
      entry("strip", 1)(cs => strip(cs.head)),
      entry("parse_timestamp", 1)(cs => parseTimestamp(cs.head)),
      entry("parse_timestamp_with_tz", 2)(cs => parseTimestampWithTz(cs(0), cs(1))),
      entry("parse_timezone", 1)(cs => parseTimezone(cs.head)),
      entry("parse_date", 1)(cs => parseDate(cs.head)),
      entry("minhash_signature", 1)(cs => MinHash.signature(cs.head)),
      entry("simhash", 1)(cs => SimHash.simhash(cs.head)))
  }

  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "internal")
    }

  // Column ↔ Expression bridges (Spark 4 classic API).
  private def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)
  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
}
