package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The extensions installer must wire all function builders without error
  * (full SQL-name behavior is covered by FunctionsSpec through
  * Functions.registerAll, which registers the same builders). */
class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions install injects all graft functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders are applied at session construction; here we validate the
    // injection calls accept our (identifier, info, builder) triples
    succeed
  }

  test("injected builders construct resolvable expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ts = ParseTimestampExpr(Literal("20190101013449+0000"))
    assert(ts.eval(null) === 1546306489000000L) // 2019-01-01T01:34:49Z micros
    val d = ParseDateExpr(Literal("01-FEB-19"))
    assert(d.eval(null) === java.time.LocalDate.of(2019, 2, 1).toEpochDay.toInt)
  }
}
