package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The recrawl snapshot diff/drift lanes: change-class semantics pinned
  * against the membership arithmetic, drift shares are per-source
  * per-mille that sum to ~1000, and the diff join is DIGEST-EARLY (the
  * shuffle carries md5+counts, never the corpus text — the 100 TB
  * shape). Both lanes are hash-gated vs DuckDB at the driver gate; these
  * pin the invariants a value-hash can't name. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_corpus_diff change classes follow the snapshot membership") {
    val rows = QueryRegistry.byName("q_corpus_diff").run(spark, dir)
      .groupBy(col("change"))
      .agg(sum(col("n_docs")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = graft.Tables.table(spark, dir, "documents")
    def cnt(c: org.apache.spark.sql.Column) = d.filter(c).count()
    val added = cnt(col("doc_id") % 7 === 3 && col("doc_id") % 13 =!= 7)
    val removed = cnt(col("doc_id") % 13 === 7 && col("doc_id") % 7 =!= 3)
    val changed = cnt(col("doc_id") % 11 === 5 &&
      col("doc_id") % 7 =!= 3 && col("doc_id") % 13 =!= 7)
    assert(rows.getOrElse("added", 0L) === added)
    assert(rows.getOrElse("removed", 0L) === removed)
    assert(rows.getOrElse("changed", 0L) === changed)
    assert(added > 0 && removed > 0 && changed > 0,
      "fixture must exercise every change class or the lane is vacuous")
    // docs in NEITHER snapshot (doc_id hits both filters) appear nowhere
    val both = cnt(col("doc_id") % 7 === 3 && col("doc_id") % 13 === 7)
    assert(rows.values.sum === d.count() - both)
  }

  test("q_corpus_drift shares are per-source per-mille (sum ~1000 after " +
      "integer-div rounding), buckets capped at 15") {
    val df = QueryRegistry.byName("q_corpus_drift").run(spark, dir)
    val bad = df.groupBy(col("source"))
      .agg(sum(col("old_pm")).as("o"), sum(col("new_pm")).as("n"))
      .filter(col("o") > 1000 || col("o") < 1000 - 16 ||
        col("n") > 1000 || col("n") < 1000 - 16)
    assert(bad.count() === 0,
      "per-source shares must sum to 1000 minus at most 16 buckets' " +
        "integer-div remainders")
    assert(df.filter(col("bucket") > 15 || col("bucket") < 0).count() === 0)
    assert(df.filter(col("delta_pm") > 0).count() > 0,
      "the synthesized recrawl must move at least one bucket share")
  }

  test("the diff join is digest-early: no text column crosses an exchange") {
    // walk the EXECUTED plan and inspect each shuffle's OUTPUT SCHEMA —
    // a tree-string grep is vacuous here because ShuffleExchangeExec's
    // line prints only the partitioning, never the exchanged attributes
    // (review r14: the previous string assertion could not fail)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val df = QueryRegistry.byName("q_corpus_diff").run(spark, dir)
    df.collect() // finalize any adaptive stages
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val here = p match {
        case s: ShuffleExchangeLike => Seq(s)
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case q: QueryStageExec => shuffles(q.plan)
        case r: ReusedExchangeExec => shuffles(r.child)
        case _ => Seq.empty
      }
      (here ++ p.children.flatMap(shuffles)).distinct
    }
    val ex = shuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "the diff must shuffle on doc_id")
    val textCarrying = ex.filter(_.output.exists(_.name == "text"))
    assert(textCarrying.isEmpty,
      s"an Exchange carries the corpus text — digest-early broken: " +
        s"${textCarrying.map(_.output.map(_.name).mkString("[", ",", "]"))}")
  }
}
