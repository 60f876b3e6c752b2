package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TypeInferenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    // ints    floats   dates         stamps                  bools    mixed   empties
    ("1", "1.5", "2024-01-01", "2024-01-01 10:00:00", "true", "42", ""),
    ("-7", "2", "2024-02-29", "2024-06-30 23:59:59", "false", "x1", ""),
    ("30", "-0.25", "2023-12-31", "2024-01-01 00:00:00", "TRUE", "9", "")
  ).toDF("a_int", "a_dbl", "a_date", "a_ts", "a_bool", "a_mixed", "a_empty")

  test("promotes each column to the narrowest type all values cast to") {
    val inf = TypeInference.infer(rows).map(i => i.column -> i.inferred).toMap
    assert(inf("a_int") === "BIGINT")
    assert(inf("a_dbl") === "DOUBLE") // "2" casts to BIGINT too, but "1.5" vetoes
    assert(inf("a_date") === "DATE") // not TIMESTAMP: DATE is narrower
    assert(inf("a_ts") === "TIMESTAMP")
    assert(inf("a_bool") === "BOOLEAN")
    assert(inf("a_mixed") === "STRING") // "x1" vetoes everything
    assert(inf("a_empty") === "STRING") // nothing to learn from
  }

  test("typed() casts promoted columns and nulls empty strings") {
    val typed = TypeInference.typed(rows, TypeInference.infer(rows))
    val types = typed.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(types("a_int") === "BIGINT")
    assert(types("a_dbl") === "DOUBLE")
    assert(types("a_date") === "DATE")
    assert(types("a_ts") === "TIMESTAMP")
    assert(types("a_bool") === "BOOLEAN")
    assert(types("a_mixed") === "STRING")
    val first = typed.orderBy("a_int").head()
    assert(first.getLong(first.fieldIndex("a_int")) === -7L)
    assert(first.getDouble(first.fieldIndex("a_dbl")) === 2.0)
  }

  test("one value that fails the cast vetoes the promotion") {
    val df = Seq("1", "2", "not_a_number").toDF("c")
    val inf = TypeInference.infer(df)
    assert(inf.head.inferred === "STRING")
    assert(inf.head.castable("BIGINT") === 2L)
    assert(inf.head.nonEmpty === 3L)
  }

  test("empty strings count as missing, not as cast failures") {
    val df = Seq("1", "", "3").toDF("c")
    val inf = TypeInference.infer(df)
    assert(inf.head.inferred === "BIGINT")
    assert(inf.head.nonEmpty === 2L)
  }
}
