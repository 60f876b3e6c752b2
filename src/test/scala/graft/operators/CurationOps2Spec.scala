package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Property specs for the round-4 curation operators, run on the sf0.001
  * fixture (oracle equality is the driver gate's job; these pin the
  * invariants a correct implementation cannot violate on ANY corpus). */
class CurationOps2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = QueryRegistry.byName(name).run(spark, dir)

  test("q_chunk_overlap: chunks tile every document exactly") {
    // stride-aligned starts, dense chunk indices, full coverage: the
    // union of [start, start+n_tok) intervals with stride 24 covers
    // [0, n) with the designed 8-token overlaps and no gaps
    val docs = graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n"))
    val agg = run("q_chunk_overlap")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), max(col("chunk_idx")).as("max_idx"),
        max(col("start_tok") + col("n_tok")).as("covered"),
        min(col("start_tok")).as("first_start"))
      .join(docs, "doc_id")
    val bad = agg.filter(
      col("max_idx") =!= col("nc") - 1 ||
        col("first_start") =!= 0L ||
        col("covered") =!= col("n")).count()
    assert(bad === 0, "every doc must be tiled densely from 0 to n")
  }

  test("q_block_dedup: identical texts with copies are fully duplicated") {
    val out = run("q_block_dedup")
    val bounds = out.filter(col("dup_frac") < 0.0 || col("dup_frac") > 1.0).count()
    assert(bounds === 0, "dup_frac must stay in [0,1]")
    // any doc whose text occurs >=2 times must have dup_frac exactly 1.0
    val copies = graft.Tables.table(spark, dir, "documents")
      .groupBy(col("text")).agg(count(lit(1)).as("nc"), collect_list(col("doc_id")).as("ids"))
      .filter(col("nc") >= 2)
      .select(explode(col("ids")).as("doc_id"))
    val notFull = out.join(copies, "doc_id").filter(col("dup_frac") =!= 1.0).count()
    assert(notFull === 0, "exact copies share every block")
  }

  test("q_dedup_canonical: total map, one canonical per cluster, canonical wins by length") {
    val out = run("q_dedup_canonical").cache()
    val nDocs = graft.Tables.table(spark, dir, "documents").count()
    assert(out.count() === nDocs, "the map must be total over documents")
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(col("is_canonical")).as("n_canon"))
      .filter(col("n_canon") =!= 1L).count()
    assert(perCluster === 0, "exactly one canonical per cluster")
    // the canonical is at least as long as every member it represents
    val chars = graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val canonLen = out.filter(col("is_canonical") === 1L)
      .join(chars, "doc_id")
      .select(col("cluster_id"), col("n_chars").as("canon_chars"))
    val tooShort = out.join(chars, "doc_id").join(canonLen, "cluster_id")
      .filter(col("n_chars") > col("canon_chars")).count()
    assert(tooShort === 0, "canonical must maximize n_chars in its cluster")
    out.unpersist()
  }

  test("q_containment: containment >= jaccard on every shared pair") {
    val cont = run("q_containment")
      .select(col("d1"), col("d2"), col("containment"))
    val jac = run("q_dedup_ngram_jaccard")
      .select(col("d1"), col("d2"), col("jaccard"))
    val bad = cont.join(jac, Seq("d1", "d2"))
      .filter(col("containment") < col("jaccard") - lit(1e-12)).count()
    assert(bad === 0, "inter/min(n1,n2) dominates inter/union algebraically")
  }

  test("q_mixture_rebalance: rates in (0,1], budgets sum to ~total") {
    val out = run("q_mixture_rebalance").cache()
    assert(out.filter(col("keep_rate") <= 0.0 || col("keep_rate") > 1.0).count() === 0)
    val row = out.agg(sum(col("tokens")).as("t"),
      sum(col("target_tokens")).as("b"), count(lit(1)).as("k")).head()
    val (t, b, k) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // k integer budgets of (t div k) each: total shortfall < k
    assert(b <= t && t - b < k, s"budgets $b must tile total $t up to div remainder")
    out.unpersist()
  }
}
