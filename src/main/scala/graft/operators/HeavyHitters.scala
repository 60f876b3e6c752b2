package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-terms (heavy hitters) via per-partition Misra–Gries summaries
  * (Misra & Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
  * Summaries") with an exact verification pass — the candidate+verify
  * shape `q_dedup_minhash_verified` uses for near-dups, applied to
  * frequency: the sketch proposes, exact arithmetic disposes, and the
  * final output is EXACT (hash-gated against a plain GROUP BY oracle).
  *
  * Why not just wordcount? At 100 TB the full `groupBy(term)` shuffles
  * the entire vocabulary — billions of distinct terms, almost all of
  * which can never reach the frequency threshold. The MG pass is
  * shuffle-free (one imperative fold per partition, ≤K counters each —
  * the documented "genuine per-partition imperative logic" exception to
  * the no-RDD rule) and emits at most K×partitions candidate terms; the
  * verify pass then counts ONLY those (broadcast semi-join before the
  * agg), so the one shuffle in the plan carries a bounded candidate set
  * instead of the vocabulary.
  *
  * Correctness does not depend on the sketch: MG with K counters over a
  * partition of n_p tokens guarantees every term with partition count
  * > n_p/(K+1) survives as a candidate, and a term with GLOBAL count
  * > N/(K+1) = Σn_p/(K+1) must exceed n_p/(K+1) on at least one
  * partition (pigeonhole over the sum) — so the candidate union is a
  * superset of the true heavy hitters regardless of how rows land on
  * partitions, and the exact-count filter makes the output identical to
  * brute force. The spec pins the superset property on an adversarially
  * partitioned fixture.
  */
object HeavyHitters {
  import Tables.table

  /** Counter capacity per partition ⇒ output = terms with global count
    * > N/(K+1). 40 keeps the gate corpora's core vocabulary (top terms at
    * ~N/28) above threshold while bounding every summary at 40 entries. */
  private[operators] val HhK = 40

  /** One Misra–Gries fold: the ≤`cap`-entry summary of an iterator.
    * Decrement-all costs O(cap) but destroys `cap` units of count mass,
    * so total eviction work is O(n) amortized. */
  private[operators] def mgSummary(
      it: Iterator[String], cap: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < cap => m.update(t, 1L)
        case None =>
          val dead = List.newBuilder[String]
          m.foreach { case (k, c) =>
            if (c == 1L) dead += k else m.update(k, c - 1)
          }
          dead.result().foreach(m.remove)
      }
    }
    m.keysIterator
  }

  /** The candidate union: per-partition MG summaries over the exploded
    * token stream — map-side only, ≤ HhK terms per partition. */
  private[operators] def mgCandidates(
      spark: SparkSession, terms: DataFrame, cap: Int = HhK): DataFrame = {
    import spark.implicits._
    terms.select(col("term")).as[String]
      .mapPartitions(it => mgSummary(it, cap))
      .toDF("term").distinct()
  }

  private def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val terms = docs.select(explode(split(trim(col("text")), " ")).as("term"))
    // N from a map-only agg over per-doc token counts — no second explode
    val total = docs
      .agg(sum(size(split(trim(col("text")), " "))).cast("long").as("total"))
    val cands = mgCandidates(spark, terms)
    terms.join(broadcast(cands), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (HhK + 1) > col("total"))
      .select(col("term"), col("cnt"))
  }

  private val qHeavyHittersSql =
    s"""WITH t AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents)
       |SELECT term, count(*) AS cnt
       |FROM t GROUP BY term
       |HAVING count(*) * ${HhK + 1} > (SELECT count(*) FROM t)""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_heavy_hitters", qHeavyHitters, Some(qHeavyHittersSql)))
}
