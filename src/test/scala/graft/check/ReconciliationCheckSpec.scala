package graft.check

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ReconciliationCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("distributed line counts per file") {
    val dir = Files.createTempDirectory("wc")
    val f1 = dir.resolve("a.csv"); Files.write(f1, "h\n1\n2\n".getBytes)
    val f2 = dir.resolve("b.csv"); Files.write(f2, "h\n1\n".getBytes)
    val counts = ReconciliationCheck.csvLineCounts(spark, Seq(f1, f2))
    // header included, like wc -l (SURVEY §7.4.3)
    assert(counts.values.toSeq.sorted === Seq(2L, 3L))
  }

  test("precise counts parse quoted embedded newlines as one record") {
    val dir = Files.createTempDirectory("precise")
    val f = dir.resolve("q.csv")
    // 1 header + 2 records, one containing a quoted newline → 4 raw lines
    Files.write(f, "id,note\n1,\"line one\nline two\"\n2,plain\n".getBytes)
    val precise = ReconciliationCheck.preciseCsvCounts(spark, Seq(f))
    assert(precise.values.toSeq === Seq(3L)) // header + 2 records
    val fast = ReconciliationCheck.csvLineCounts(spark, Seq(f))
    assert(fast.values.toSeq === Seq(4L)) // raw lines, wc -l parity
  }

  test("delta ledger and fatal threshold") {
    val r = ReconciliationCheck.check(
      Map("a" -> 100L, "b" -> 200L),
      Map("a" -> 98L, "b" -> 200L, "c" -> 5L))
    assert(r.tables.map(_.table) === Seq("a", "b", "c"))
    assert(r.totalDelta === 7L)
    assert(!r.fatal)
    val fatal = ReconciliationCheck.check(Map("a" -> 500L), Map("a" -> 0L))
    assert(fatal.fatal) // 500 > 100
  }

  test("relational form: full-outer join with abs delta") {
    import spark.implicits._
    val csv = Seq(("a", 10L), ("b", 5L)).toDF("tbl", "cnt")
    val db = Seq(("a", 8L), ("c", 1L)).toDF("tbl", "cnt")
    val out = ReconciliationCheck.checkDf(spark, csv, db)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(("a", 10L, 8L, 2L), ("b", 5L, 0L, 5L), ("c", 0L, 1L, 1L)))
  }
}
