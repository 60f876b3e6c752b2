package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Misra–Gries heavy hitters: exactness vs brute force, the candidate
  * superset guarantee under adversarial partitioning, and the summary
  * fold's own arithmetic. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mgSummary keeps every term above n/(cap+1) (majority fixture)") {
    // 9 tokens, cap 2 → guarantee covers counts > 3: "a" (4 occurrences)
    // must survive no matter how the others interleave.
    val stream = Seq("a", "b", "c", "a", "d", "a", "e", "a", "f")
    val out = HeavyHitters.mgSummary(stream.iterator, 2).toSet
    assert(out.contains("a") && out.size <= 2)
  }

  test("candidate union is a superset of true heavy hitters under adversarial partitioning") {
    // "hot" has global count 40 of N=120; spread it across all 8
    // partitions among unique filler, and shrink the capacity to 3 so
    // every partition's summary actually evicts: per partition ~5 hot of
    // ~15 tokens > 15/(3+1), so the MG bound still forces survival.
    val rows = (1 to 40).map(i => (i % 8, "hot")) ++
      (1 to 80).map(i => (i % 8, s"filler$i"))
    val terms = rows.toDF("p", "term").repartition(8, col("p")).select("term")
    val cands = HeavyHitters.mgCandidates(spark, terms, cap = 3)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("hot"))
  }

  test("q_heavy_hitters equals brute-force wordcount + threshold (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = QueryRegistry.byName("q_heavy_hitters").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val terms = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(col("text")), " ")).as("term"))
    val n = terms.count()
    val want = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter { case (_, c) => c * 41 > n }.toMap
    assert(want.nonEmpty, "fixture must produce at least one heavy hitter")
    assert(got === want)
  }
}
