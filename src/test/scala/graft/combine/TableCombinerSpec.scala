package graft.combine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TableCombinerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("positional union with first-member schema authority") {
    val a = Seq(("x", "1")).toDF("name", "height")
    val b = Seq(("y", "2")).toDF("nom", "taille") // different names, same arity
    val c = TableCombiner.combine(Seq(a, b))
    assert(c.columns.toSeq === Seq("name", "height"))
    assert(c.count() === 2)
  }

  test("arity mismatch fails fast (reference fails at INSERT)") {
    val a = Seq(("x", "1")).toDF("name", "height")
    val b = Seq("y").toDF("name")
    assertThrows[IllegalArgumentException] {
      TableCombiner.combine(Seq(a, b))
    }
  }

  test("stem collision skips combine with warning (main.py:222-226)") {
    val a = Seq(("x", "1")).toDF("name", "height")
    assert(TableCombiner.combineGrouped("animals", Seq("animals", "animals_2"), Seq(a, a)).isEmpty)
    assert(TableCombiner.combineGrouped("animals", Seq("animals_1", "animals_2"), Seq(a, a)).isDefined)
  }
}
