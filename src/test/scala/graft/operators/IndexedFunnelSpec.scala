package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Production-cadence twins of the two inline-training lanes the round-8
  * verdict flagged (#1/#2): the indexed curation funnel and the indexed
  * CCNet selection must be ROW-IDENTICAL to their inline lanes — they
  * ride the same oracles at the gate, and these specs pin the equality
  * on the fixture so a divergence is caught before the gate runs. */
class IndexedFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[String] =
    QueryRegistry.byName(name).run(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def bothEqual(inline: String, indexed: String): Unit = {
    val a = rows(inline)
    val b = rows(indexed)
    assert(a === b, s"$indexed must be row-identical to $inline")
    assert(a.nonEmpty, s"$inline is empty on the fixture — vacuous equality")
  }

  test("q_ccnet_buckets_indexed ≡ q_ccnet_buckets (persisted LM model)") {
    bothEqual("q_ccnet_buckets", "q_ccnet_buckets_indexed")
  }

  test("q_curation2_indexed ≡ q_curation2 (persisted clf/LM/winnow stores)") {
    bothEqual("q_curation2", "q_curation2_indexed")
  }

  test("indexed funnel leaves no cached frames behind (leak fix)") {
    // both lanes collect their one-row aggregate eagerly and unpersist
    // the staged frame before returning — repeated invocation must not
    // accumulate cache entries (ADVICE r8: a leaked MEMORY_AND_DISK
    // full-corpus frame per call)
    spark.sharedState.cacheManager.clearCache()
    QueryRegistry.byName("q_curation2_indexed").run(spark, dir).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "curation funnel must unpersist its staged frame")
  }
}
