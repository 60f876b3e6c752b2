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

  test("ragged siblings fail positionally, succeed by name (opt-in)") {
    // a later export gained a column and reordered the common ones
    val jan = Seq(("x", "1")).toDF("name", "height")
    val feb = Seq(("2", "y", "blue")).toDF("height", "name", "color")
    assertThrows[IllegalArgumentException] {
      TableCombiner.combine(Seq(jan, feb)) // positional: arity mismatch
    }
    val c = TableCombiner.combine(Seq(jan, feb), byName = true)
    assert(c.columns.toSeq === Seq("name", "height", "color"))
    val rows = c.collect().map(r =>
      (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows === Set(("x", "1", None), ("y", "2", Some("blue"))))
  }

  test("by-name combine flows through combineGrouped") {
    val a = Seq(("x", "1")).toDF("name", "height")
    val b = Seq(("2", "y")).toDF("height", "name")
    val c = TableCombiner.combineGrouped("t", Seq("t_1", "t_2"), Seq(a, b), byName = true)
    assert(c.get.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("x", "1"), ("y", "2")))
  }

  test("stem collision skips combine with warning (main.py:222-226)") {
    val a = Seq(("x", "1")).toDF("name", "height")
    assert(TableCombiner.combineGrouped("animals", Seq("animals", "animals_2"), Seq(a, a)).isEmpty)
    assert(TableCombiner.combineGrouped("animals", Seq("animals_1", "animals_2"), Seq(a, a)).isDefined)
  }
}
