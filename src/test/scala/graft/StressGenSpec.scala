package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StressGen is load-bearing evidence infrastructure (every PERF stress
  * number derives from it) — pin its contract on a tiny K=2 derivation
  * of the sf0.001 fixture. */
class StressGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stress").toString
    StressGen.run(spark, "/root/testdata/sf0.001", dir, 2)
    dir
  }

  test("row counts scale by K for facts, dimensions stay verbatim") {
    def n(t: String) = spark.read.parquet(s"$out/$t.parquet").count()
    def src(t: String) = Tables.table(spark, "/root/testdata/sf0.001", t).count()
    Seq("region", "nation").foreach(t => assert(n(t) === src(t), t))
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach(t => assert(n(t) === 2 * src(t), t))
  }

  test("foreign keys stay join-consistent across copies") {
    val l = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() === 0,
      "every lineitem must resolve its order")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() === 0,
      "every order must resolve its customer")
  }

  test("content duplication doubles: every text occurs an even number of times") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val odd = docs.groupBy(col("text")).agg(count(lit(1)).as("n"))
      .filter(col("n") % 2 =!= 0).count()
    assert(odd === 0, "K=2 copies make every text count even")
    // doc ids stay unique after offsetting
    assert(docs.select(col("doc_id")).distinct().count() === docs.count())
  }

  test("saltFrac=1 makes every replicated copy's text globally distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stress-salt").toString
    StressGen.run(spark, "/root/testdata/sf0.001", dir, 2, saltFrac = 1.0)
    val src = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.count() === 2 * src.count())
    // copy 0 verbatim, copy 1 fully salted with a per-doc unique suffix
    val salted = docs.filter(col("text").contains("#salt1-"))
    assert(salted.count() === src.count(), "all of copy 1 must be salted")
    val expectedDistinct =
      src.select(col("text")).distinct().count() + src.count()
    assert(docs.select(col("text")).distinct().count() === expectedDistinct,
      "salted texts are unique; verbatim copy keeps the source's distincts")
    // determinism: a re-run produces the identical salted table
    val dir2 = java.nio.file.Files.createTempDirectory("graft-stress-salt").toString
    StressGen.run(spark, "/root/testdata/sf0.001", dir2, 2, saltFrac = 1.0)
    val again = spark.read.parquet(s"$dir2/documents.parquet")
    assert(docs.except(again).isEmpty && again.except(docs).isEmpty)
  }
}
