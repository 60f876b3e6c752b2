package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Attrition accounting for the round-8 composed funnel (oracle equality
  * is the driver gate's job; these pin the invariants any correct funnel
  * must satisfy on ANY corpus). */
class CurationFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val ledger: Map[String, (Long, Long)] =
    QueryRegistry.byName("q_curation2").run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private val order =
    Seq("1_total", "2_quality", "3_classifier", "4_ccnet", "5_dedup", "6_train")

  test("exactly the six stages, every one non-empty on the fixture") {
    assert(ledger.keySet === order.toSet)
    order.foreach(s => assert(ledger(s)._1 > 0, s))
  }

  test("docs and tokens attrite monotonically, and genuinely attrite") {
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(ledger(b)._1 <= ledger(a)._1, s"$b docs > $a")
      assert(ledger(b)._2 <= ledger(a)._2, s"$b tokens > $a")
    }
    // the funnel is not vacuous: every gate except dedup cuts something
    // on this fixture, and the whole funnel keeps a minority
    assert(ledger("6_train")._1 < ledger("1_total")._1 / 2)
  }

  test("1_total accounts for the whole corpus exactly") {
    val d = graft.Tables.table(spark, dir, "documents")
    val n = d.count()
    val toks = d.agg(sum(size(split(trim(col("text")), " ")).cast("long")))
      .head().getLong(0)
    assert(ledger("1_total") === ((n, toks)))
  }

  test("the train split keeps the hash-bucket fraction of dedup survivors") {
    val (nDedup, _) = ledger("5_dedup")
    val (nTrain, _) = ledger("6_train")
    // exact recomputation of the 80%-bucket membership over survivors is
    // the oracle's job; here pin the band a correct 80/100 bucket split
    // cannot leave on 86 survivors
    assert(nTrain <= nDedup)
    assert(nTrain.toDouble / nDedup >= 0.6 && nTrain.toDouble / nDedup <= 0.95,
      s"train fraction ${nTrain.toDouble / nDedup}")
  }

  test("the dedup stage genuinely removes near-duplicate survivors") {
    val dropped = ledger("4_ccnet")._1 - ledger("5_dedup")._1
    // the fixture's stage-4 survivors contain winnow-detectable near-dups
    // (or exact copies) — a dedup stage that drops nothing is broken
    assert(dropped > 0, "dedup stage removed nothing on the fixture")
  }
}
