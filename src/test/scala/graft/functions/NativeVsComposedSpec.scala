package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native Catalyst expressions must agree exactly with the
  * reference-shaped Column compositions on every branch and edge. */
class NativeVsComposedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    "31-JAN-19 03.20.00.000000000 PM +01:00",
    "31-JAN-19 03.20.00 PM +01:00",
    "28-MAR-19 05.02.10.000000000 AM GMT",
    "28-MAR-19 05.02.10 AM GMT",
    "20190101013449+0000",
    "20190101013449+0130",
    "01-JAN-19 12.00.00 AM +00:00",
    "01-JAN-19 12.00.00 PM +00:00",
    "31-JAN-19 03.20.00.123456789 PM +00:00",
    "29-FEB-19 01.00.00 AM GMT", // invalid date
    "99-JAN-19 01.00.00 AM GMT", // invalid day
    "31-XXX-19 01.00.00 AM GMT", // invalid month
    "garbage", "", "2019-01-01 00:00:00")

  test("parse_timestamp: native expression == composed built-ins") {
    val df = corpus.toDF("s").select(
      col("s"),
      Functions.parseTimestamp(col("s")).as("native"),
      Functions.parseTimestampComposed(col("s")).as("composed"))
    df.collect().foreach { r =>
      assert(r.get(1) === r.get(2), s"mismatch for input '${r.getString(0)}'")
    }
  }

  test("parse_date: native expression == composed built-ins") {
    val dates = Seq("01-FEB-19", "01-Feb-19", "29-FEB-19", "29-FEB-20",
      "31-APR-19", "nope", "")
    val df = dates.toDF("s").select(
      col("s"),
      Functions.parseDate(col("s")).as("native"),
      Functions.parseDateComposed(col("s")).as("composed"))
    df.collect().foreach { r =>
      assert(r.get(1) === r.get(2), s"mismatch for input '${r.getString(0)}'")
    }
  }
}
