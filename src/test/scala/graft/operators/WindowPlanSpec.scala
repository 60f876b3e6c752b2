package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Plan-pins for the value-domain-bounded rank windows (round-7 verdict
  * item 3): their single-partition safety currently rests on optimizer
  * behavior — `InferWindowGroupLimit` keeping per-task top-k BEFORE the
  * exchange — so an upgrade or rewrite that silently turns them into
  * full single-partition windows at scale must fail a spec, not a
  * production run. */
class WindowPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = QueryRegistry.byName(name).run(spark, dir)
    assert(df.count() > 0, s"$name returned no rows")
    df.queryExecution.executedPlan.toString
  }

  test("q_bpe_merge rank never plans a full single-partition window") {
    // with the constant partition key the optimizer pushes the rank
    // filter down as TakeOrderedAndProject(limit=k) BELOW the window (the
    // window then runs over ≤k rows); WindowGroupLimit is the other safe
    // shape. A plan with neither would sort the full pair domain in one
    // partition — the regression this spec exists to catch.
    val plan = planOf("q_bpe_merge")
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      s"neither TakeOrderedAndProject nor WindowGroupLimit in:\n$plan")
  }

  test("q_keyword_search final top-k is TakeOrderedAndProject, never a corpus sort") {
    val plan = planOf("q_keyword_search")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
  }

  test("q_quantile_sketch bottom-k plans a WindowGroupLimit") {
    val plan = planOf("q_quantile_sketch")
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("q_hybrid_search: both candidate lists and the fusion rank keep WindowGroupLimit") {
    // three rank windows (lexical top-CandK, vector top-CandK, fused
    // top-K) — each must plan per-partition group limits BEFORE its
    // exchange, or a corpus-sized candidate set sorts in one task
    val plan = planOf("q_hybrid_search")
    val hits = "WindowGroupLimit".r.findAllIn(plan).size
    assert(hits >= 3, s"expected >=3 WindowGroupLimit, got $hits in:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"query sides must broadcast, plan:\n$plan")
  }
}
