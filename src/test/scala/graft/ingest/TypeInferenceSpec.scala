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

  test("exception-free DOUBLE guard accepts exactly what the raw cast accepts") {
    // adversarial char-class survivors ('F', dates, 'e', '+-1') plus every
    // grammar corner Java's parser takes: suffixes, bare fractions,
    // exponents, special literals in assorted case, padded whitespace
    val tricky = Seq(
      "1", "-7", "1.5", ".5", "5.", "1e3", "1E-3", "+2.5e+10", "1.5f", "2d",
      "F", "D", "e", ".", "+", "-", "+-1", "1e", "e3", "1.2.3",
      "1995-02-03", "2024-01-01 10:00:00", "1-URGENT", "true",
      "NaN", "nan", "Infinity", "-Infinity", "+inf", "-INF", " 42 ", "\t-1.5\n")
    import org.apache.spark.sql.functions.{count, expr, when}
    val df = tricky.toDF("c")
    val Seq(guarded, raw) = df.agg(
      count(when(expr("c IS NOT NULL AND length(c) > 0") &&
        TypeInference.castsToForTest("c", "DOUBLE"), 1)),
      count(when(expr("try_cast(c AS DOUBLE) IS NOT NULL"), 1))
    ).head().toSeq.map(_.asInstanceOf[Long])
    assert(guarded === raw)
    // the one documented divergence: Java hex-float forms are filtered
    val hex = Seq("0x1p3").toDF("c")
    assert(hex.filter(TypeInference.castsToForTest("c", "DOUBLE")).count() === 0L)
    assert(hex.filter(expr("try_cast(c AS DOUBLE) IS NOT NULL")).count() === 1L)
  }

  test("exception-free DATE/TIMESTAMP/BIGINT guards match the raw predicates") {
    // year caps ('294247'/'294248'), digit-width edges ('123'/'1234567'),
    // non-canonical dates, time parts, zone suffixes, signs, garbage
    val tricky = Seq(
      "1234", "123", "1234567", "294247", "294248", "999999", "-1234", "+1995",
      "0000", "1995-02-03", "1995-2-3", "1995-02", "1995-13-01", "12345-01-01",
      "1995-02-03 10:00:00", "1995-02-03T10:00:00.123", "2024-01-01 10:00:00 UTC",
      "2024-01-01 99:00:00", "garbage", "1234.56", " 2024-01-01 ", "1-URGENT",
      "true", "F", "")
    import org.apache.spark.sql.functions.{count, expr, when}
    val df = tricky.toDF("c")
    val nonEmpty = expr("c IS NOT NULL AND length(c) > 0")
    val raw = Map(
      "BIGINT" -> expr("try_cast(c AS BIGINT) IS NOT NULL"),
      "DATE" -> expr("cast(try_cast(c AS DATE) AS STRING) = trim(c)"),
      "TIMESTAMP" -> expr("try_cast(c AS TIMESTAMP) IS NOT NULL"))
    for ((t, rawPred) <- raw) {
      val Seq(guarded, unguarded) = df.agg(
        count(when(nonEmpty && TypeInference.castsToForTest("c", t), 1)),
        count(when(nonEmpty && rawPred, 1))
      ).head().toSeq.map(_.asInstanceOf[Long])
      assert(guarded === unguarded, s"guard for $t diverges from raw predicate")
    }
  }
}
