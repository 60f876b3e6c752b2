package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The pseudo-labeling / hard-negative / model-diagnostic lanes. All five
  * are hash-gated vs DuckDB at the driver gate; these pin the invariants
  * a value-hash can't name: vote accounting, the LSH lane's coverage
  * column, label-inequality of mined negatives, calibration mass
  * conservation, and kappa's exact agreement arithmetic. */
class LabelEvalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.Tables.table(spark, dir, "embeddings")

  test("q_knn_label_prop: census covers every held-out vector exactly once, " +
      "labels come from the labeled side, and exact kNN never abstains") {
    val df = QueryRegistry.byName("q_knn_label_prop").run(spark, dir)
    val nUnlabeled = emb.filter(col("vec_id") % 5 === 0).count()
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) === nUnlabeled)
    // the brute-force lane pairs every query with the whole labeled corpus
    // — an abstention row (pred_label = -1) would mean lost queries
    assert(df.filter(col("pred_label") === -1).count() === 0)
    val labels = emb.select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    val preds = df.select(col("pred_label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(preds.subsetOf(labels), "predictions must be real labels")
    // per-true shares are per-mille of that true class: sum to 1000 minus
    // at most one integer-div remainder per census cell
    val bad = df.groupBy(col("true_label"))
      .agg(sum(col("share_pm")).as("s"), count(lit(1)).as("k"))
      .filter(col("s") > 1000 || col("s") < lit(1000) - col("k"))
    assert(bad.count() === 0)
  }

  test("q_label_prop_lsh: bucket-probed votes agree with exact kNN on most " +
      "queries (the recall the multiprobe buys), coverage loss is explicit") {
    val lsh = QueryRegistry.byName("q_label_prop_lsh").run(spark, dir)
    val nUnlabeled = emb.filter(col("vec_id") % 5 === 0).count()
    assert(lsh.agg(sum(col("n_docs"))).head.getLong(0) === nUnlabeled,
      "every query lands in the census — uncovered ones as pred_label -1")
    // diagonal mass (pred == true) within 15% of the exact lane's — the
    // LSH vote is an approximation of the same statistic, not a new one
    def diag(name: String): Long = {
      val df = QueryRegistry.byName(name).run(spark, dir)
      df.filter(col("pred_label") === col("true_label"))
        .agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)
    }
    val exact = diag("q_knn_label_prop")
    val approx = diag("q_label_prop_lsh")
    assert(exact > 0, "fixture must give exact kNN some signal")
    assert(math.abs(exact - approx) <= math.max(2L, (exact * 3) / 10),
      s"LSH diagonal $approx strays too far from exact $exact")
  }

  test("LSH cell-count dispatch: oracle-pinned 4 bits below the scale " +
      "threshold, ~128-vector target cells above, capped at 16 bits") {
    assert(LabelOps.lshBitsFor(500L) === 4)
    assert(LabelOps.lshBitsFor(9999L) === 4)
    assert(LabelOps.lshBitsFor(10000L) === 7,  // ceil(log2(10000/128))
      "just past the threshold the geometry must already grow")
    assert(LabelOps.lshBitsFor(20000L) === 8)  // the measured stress point
    assert(LabelOps.lshBitsFor(10000000L) === 16, "hard cap")
  }

  test("q_label_prop_ivf: the persisted-store lane is row-identical to the " +
      "inline learned lane (the shared-oracle certificate), and the cell " +
      "probe covers every query") {
    val inline = QueryRegistry.byName("q_label_prop_ivf").run(spark, dir)
    val indexed = QueryRegistry.byName("q_label_prop_ivf_indexed").run(spark, dir)
    assert(inline.exceptAll(indexed).count() === 0 &&
      indexed.exceptAll(inline).count() === 0,
      "store-served votes must equal inline learned votes row for row")
    val nUnlabeled = emb.filter(col("vec_id") % 5 === 0).count()
    assert(inline.agg(sum(col("n_docs"))).head.getLong(0) === nUnlabeled)
    // nprobe=4 of 10 label-trained cells gives every query a candidate
    // pool at this fixture's geometry — abstention would mean the probe
    // plan silently under-covered
    assert(inline.filter(col("pred_label") === -1).count() === 0)
  }

  test("q_hard_negatives: k per anchor, strictly different label, ranked by " +
      "cosine with the deterministic tiebreak") {
    val df = QueryRegistry.byName("q_hard_negatives").run(spark, dir).cache()
    val labels = emb.select(col("vec_id"), col("label"))
    val joined = df
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("ql")),
        "query_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl")),
        "neighbor_id")
    assert(joined.filter(col("ql") === col("nl")).count() === 0,
      "a hard negative must carry a different label")
    val perQ = df.groupBy(col("query_id")).agg(count(lit(1)).as("k"),
      max(col("rank")).as("mx"), min(col("rank")).as("mn"))
    assert(perQ.filter(col("k") =!= 5 || col("mx") =!= 5 || col("mn") =!= 1)
      .count() === 0, "exactly ranks 1..5 per anchor")
    // ranks are cosine-descending
    val inversions = df.alias("a").join(df.alias("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rank") < col("b.rank") && col("a.cosine") < col("b.cosine"))
    assert(inversions.count() === 0)
    df.unpersist()
  }

  test("q_semantic_contamination: census conserves the corpus, flags a " +
      "nonempty τ-neighborhood, and share arithmetic is exact") {
    val df = QueryRegistry.byName("q_semantic_contamination").run(spark, dir)
      .cache()
    assert(df.agg(sum(col("n_total"))).head.getLong(0) === emb.count())
    assert(df.agg(sum(col("n_flagged"))).head.getLong(0) > 0,
      "τ must flag some corpus vectors or the lane is vacuous")
    assert(df.filter(col("n_flagged") > col("n_total")).count() === 0)
    assert(df.filter(
      col("share_pm") =!= expr("(n_flagged * 1000) div n_total")).count() === 0)
    df.unpersist()
  }

  test("contamination τ-margin: no eval×corpus cosine sits within ε of τ " +
      "at the gate SFs, so a one-ulp engine difference can't flip the set") {
    // round-14 lesson: the driver's gate disagreed on this lane while two
    // local environments matched — float membership at a threshold is only
    // hash-gateable if the fixture leaves a margin. Pre-normalized compare
    // (one rounding per element, then one fold) + this margin make the
    // flagged set engine-invariant.
    val eps = 1e-6
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = LabelOps.contamCorpus(spark, sf)
      val ev = e.filter(col("vec_id") < SimilarityOps.NumQueries)
        .select(col("vec_id").as("eval_id"), col("nv").as("qnv"))
      val minMargin = e.join(broadcast(ev), col("vec_id") =!= col("eval_id"))
        .select(abs(graft.functions.VectorOps.dot(col("qnv"), col("nv"))
          - LabelOps.ContamTau).as("m"))
        .agg(min(col("m"))).head.getDouble(0)
      assert(minMargin > eps,
        s"$sf: a cosine sits $minMargin from τ — inside the $eps guard band")
    }
  }

  test("q_label_prop_lsh oracle comparability: the SQL pins 4-bit cells, " +
      "so the gate fixtures must stay below the scale threshold where the " +
      "Spark side's lshBitsFor dispatch departs from the oracle") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val n = graft.Tables.table(spark, sf, "embeddings").count()
      assert(n < SimilarityOps.IvfScaleThreshold,
        s"$sf has $n vectors ≥ threshold — q_label_prop_lsh is no longer " +
          "hash-gateable there; regenerate the fixture or derive the " +
          "oracle's bit count from the same dispatch")
      assert(LabelOps.lshBitsFor(n) === SimilarityOps.AxisBits)
    }
  }

  test("q_calibration: bins partition the holdout, counts conserve, and " +
      "conf/acc stay in per-mille range") {
    val df = QueryRegistry.byName("q_calibration").run(spark, dir)
    val holdout = graft.Tables.table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) === holdout)
    assert(df.filter(col("bin") < 0 || col("bin") > 9).count() === 0)
    assert(df.filter(col("acc_pm") < 0 || col("acc_pm") > 1000 ||
      col("mean_conf_pm") < 0 || col("mean_conf_pm") > 1000).count() === 0)
    assert(df.filter(col("n_correct") > col("n_docs")).count() === 0)
    assert(df.count() >= 3,
      "the spread-normalized margin must populate several bins — one " +
        "bin means the confidence signal degenerated (see the conf_pm " +
        "derivation note)")
  }

  test("q_quality_kappa: confusion marginals and exact kappa arithmetic " +
      "reproduce from first principles") {
    val row = QueryRegistry.byName("q_quality_kappa").run(spark, dir).head
    val n = row.getAs[Long]("n")
    val a1 = row.getAs[Long]("a1")
    val b1 = row.getAs[Long]("b1")
    val agree = row.getAs[Long]("n_agree")
    assert(n === graft.Tables.table(spark, dir, "documents").count())
    assert(a1 > 0 && a1 < n && b1 > 0 && b1 < n,
      "thresholds must split the fixture or the agreement is vacuous")
    val peNum = a1 * b1 + (n - a1) * (n - b1)
    val expected =
      if (n * n == peNum) 0L
      else (1000L * (n * agree - peNum)) / (n * n - peNum)
    assert(row.getAs[Long]("kappa_pm") === expected)
    assert(row.getAs[Long]("po_pm") === agree * 1000 / n)
  }
}
