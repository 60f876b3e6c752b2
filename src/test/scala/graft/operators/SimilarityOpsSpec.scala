package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SimilarityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("multiprobe never lowers LSH recall (candidate-superset monotonicity)") {
    // 1-bit multiprobe only ADDS candidate buckets per query band; the
    // rescoring top-k over a candidate superset cannot lose true top-k
    // members (anything displacing a true member has higher cosine and is
    // itself a true member — tie-breaks on neighbor_id agree both sides)
    def meanRecall(probe: Boolean): Double =
      SimilarityOps.recallOf(spark, dir,
          SimilarityOps.lshTopK(spark, dir, 8, 4, probe))
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
    val exact = meanRecall(probe = false)
    val probed = meanRecall(probe = true)
    assert(probed >= exact,
      s"multiprobe recall $probed must be >= exact-probe recall $exact")
    assert(probed > 0.8, s"8x4+probe should recover strong recall, got $probed")
  }

  test("learned-centroid IVF beats label cells and clears recall@5 ≥ 0.8 at nprobe=4") {
    // the round-4 verdict bar: learned coarse quantization must lift IVF
    // recall to ≥ 0.8 at nprobe ≤ 4 (label cells manage 0.56 at the same
    // scan fraction). Run at sf0.01 — the sweep harness's SF.
    val d = "/root/testdata/sf0.01"
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.recallOf(spark, d, df)
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
    val learned = meanRecall(SimilarityOps.ivfLearnedTopK(spark, d, nprobe = 4))
    val labelCells = meanRecall(SimilarityOps.ivfTopK(spark, d, nprobe = 4))
    assert(learned >= 0.8, s"learned IVF recall@5 at nprobe=4 was $learned")
    assert(learned > labelCells,
      s"learned cells ($learned) must beat data-given label cells ($labelCells)")
  }

  test("PQ ADC propose + exact rescore clears recall@5 ≥ 0.9 and is a dense top-k") {
    // 8×8-dim subspaces, 32 codes each, rescore budget 150: the ADC propose
    // stage only has to land the true top-5 inside its top-150 — the exact
    // cosine rescore then ranks them identically to brute force, so
    // recall is the sole quality axis (ordering errors are impossible
    // among surviving candidates).
    val out = SimilarityOps.qAnnPq(spark, dir)
    val r = SimilarityOps.recallOf(spark, dir, out)
      .agg(avg(col("recall_at_k"))).head().getDouble(0)
    assert(r >= 0.9, s"PQ recall@5 with rescore=150 was $r")
    val rows = out.select(col("query_id"), col("neighbor_id"), col("rank")).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(2)).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"ranks must be dense for query $q")
      assert(!rs.exists(_.getLong(1) == q), s"query $q must not be its own neighbor")
    }
  }

  test("multiprobe output is structurally a top-k per query") {
    val out = SimilarityOps.lshTopK(spark, dir, 8, 4, multiprobe = true)
      .select(col("query_id"), col("neighbor_id"), col("rank")).collect()
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"ranks must be dense for query $q")
      assert(ranks.length <= 5, s"at most k=5 rows per query, got ${ranks.length}")
      assert(!rows.exists(_.getLong(1) == q), s"query $q must not be its own neighbor")
    }
  }
}
