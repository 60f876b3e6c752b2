package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the reference scalar-function library — inputs from
  * FIXTURES.md §3 / reference hooks/functions.sql:39-43 comments. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def strip1(s: String): Option[String] =
    Seq(s).toDF("v").select(Functions.strip(col("v"))).collect().head match {
      case r if r.isNullAt(0) => None
      case r                  => Some(r.getString(0))
    }

  test("strip removes CR/LF ends, all quotes, empty→NULL") {
    assert(strip1("\nfoo\"bar\r") === Some("foobar"))
    assert(strip1("\"\"") === None)
    assert(strip1("") === None)
    assert(strip1("plain") === Some("plain"))
    // quotes removed everywhere; interior newlines preserved
    assert(strip1("a\"b\nc\"d") === Some("ab\ncd"))
  }

  test("strip NULL-in → NULL-out") {
    val out = Seq[Option[String]](None).toDF("v")
      .select(Functions.strip(col("v"))).collect().head
    assert(out.isNullAt(0))
  }

  private def parseTs(s: String): Option[java.sql.Timestamp] =
    Seq(s).toDF("v").select(Functions.parseTimestamp(col("v"))).collect().head match {
      case r if r.isNullAt(0) => None
      case r                  => Some(r.getTimestamp(0))
    }

  private def utc(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s) // session TZ is UTC

  test("parse_timestamp branch 1: nanos + offset") {
    // 03:20 PM at +01:00 → 14:20 UTC
    assert(parseTs("31-JAN-19 03.20.00.000000000 PM +01:00") === Some(utc("2019-01-31 14:20:00")))
  }

  test("parse_timestamp branch 2: no nanos + offset") {
    assert(parseTs("31-JAN-19 03.20.00 PM +01:00") === Some(utc("2019-01-31 14:20:00")))
  }

  test("parse_timestamp branch 3: nanos + named zone") {
    assert(parseTs("28-MAR-19 05.02.10.000000000 AM GMT") === Some(utc("2019-03-28 05:02:10")))
  }

  test("parse_timestamp branch 4: no nanos + named zone") {
    assert(parseTs("28-MAR-19 05.02.10 AM GMT") === Some(utc("2019-03-28 05:02:10")))
  }

  test("parse_timestamp branch 5: compact with offset") {
    assert(parseTs("20190101013449+0000") === Some(utc("2019-01-01 01:34:49")))
    assert(parseTs("20190101013449+0100") === Some(utc("2019-01-01 00:34:49")))
  }

  test("parse_timestamp: 12-hour edge cases") {
    assert(parseTs("01-JAN-19 12.00.00 AM +00:00") === Some(utc("2019-01-01 00:00:00")))
    assert(parseTs("01-JAN-19 12.00.00 PM +00:00") === Some(utc("2019-01-01 12:00:00")))
  }

  test("parse_timestamp: unmatched → NULL") {
    assert(parseTs("not a timestamp") === None)
    assert(parseTs("2019-01-01 00:00:00") === None)
  }

  test("parse_timestamp: fractional seconds truncated to micros") {
    assert(parseTs("31-JAN-19 03.20.00.123456789 PM +00:00")
      === Some(java.sql.Timestamp.valueOf("2019-01-31 15:20:00.123456")))
  }

  test("parse_timezone extracts 3-letter token, else NULL") {
    val df = Seq(
      "28-MAR-19 05.02.10.000000000 AM GMT",
      "28-MAR-19 05.02.10 AM GMT",
      "31-JAN-19 03.20.00 PM +01:00",
      "garbage").toDF("v").select(Functions.parseTimezone(col("v")))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq === Seq("GMT", "GMT", null, null))
  }

  test("parse_date: 01-FEB-19 → 2019-02-01, case-insensitive, NULL on junk") {
    val df = Seq("01-FEB-19", "01-Feb-19", "29-FEB-19", "nope").toDF("v")
      .select(Functions.parseDate(col("v")))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getDate(0).toString)
    // 29-FEB-19: invalid date → NULL (make_date returns NULL on invalid)
    assert(out.toSeq === Seq("2019-02-01", "2019-02-01", null, null))
  }

  test("has_column: catalog introspection (F2)") {
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("hc_table")
    assert(Functions.hasColumn(spark, "hc_table", "id"))
    assert(!Functions.hasColumn(spark, "hc_table", "nope"))
    assert(!Functions.hasColumn(spark, "hc_missing_table", "id"))
  }

  test("SQL registration keeps functions callable from hook SQL") {
    Functions.registerAll(spark)
    val r = spark.sql(
      """SELECT strip('  "x"  ') AS s,
        |       parse_date('01-FEB-19') AS d,
        |       parse_timezone('28-MAR-19 05.02.10 AM GMT') AS z,
        |       parse_timestamp('20190101013449+0000') AS t""".stripMargin).collect().head
    assert(r.getString(0) === "  x  ")
    assert(r.getDate(1).toString === "2019-02-01")
    assert(r.getString(2) === "GMT")
    assert(r.getTimestamp(3) === utc("2019-01-01 01:34:49"))
  }
}
