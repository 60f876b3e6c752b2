package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pseudo-labeling / label propagation over the embedding corpus — the
  * auto-labeling slot of a curation stack: given a mostly-labeled corpus,
  * assign labels to the unlabeled remainder from their nearest labeled
  * neighbors (the standard semi-supervised loop that turns a small
  * hand-labeled seed into corpus-scale weak labels), plus hard-negative
  * mining for contrastive / embedding-model training. (The reference has
  * no vector surface at all; these extend the ANN family the same way
  * `q_ann_mrr` extends retrieval eval.)
  *
  * The fixture has no unlabeled rows, so the scenario is synthesized
  * deterministically (the q_redact / CorpusDiff move): `vec_id % 5 == 0`
  * rows are treated as unlabeled — their stored label becomes the ground
  * truth the propagation census is scored against, so the OPERATOR is
  * hash-gated end to end (prediction + evaluation in one output).
  *
  * Scale shapes — the two lanes are the two deployment regimes:
  *  - [[qKnnLabelProp]] (exact kNN vote): the bounded-batch regime — an
  *    active-learning round pseudo-labels a labeling-budget-sized batch.
  *    The batch broadcasts; the labeled corpus streams through ONE scan
  *    (no shuffle of the corpus side, same plan family as
  *    `q_ann_cosine_topk`). Cost: |corpus| × |batch| dot products.
  *  - [[qLabelPropLsh]] (bucket-join vote): the corpus-scale regime — ANY
  *    unlabeled fraction. Both sides key by a deterministic axis-sign LSH
  *    cell and meet in a SHUFFLE join on the cell key (explicitly not
  *    broadcast): per-cell work is |cell|², fully distributed, and the
  *    cell count is a geometry constant that grows with corpus size
  *    (bits ≈ log2(n / target_cell_size); fixed at 4 bits for the
  *    fixture so every cell holds enough voters). Multiprobe (the
  *    Hamming-1 flips, same trick as `q_ann_lsh_portable`) recovers the
  *    recall a single-cell probe loses at cell boundaries.
  *
  * Vote discipline (both lanes, and both engines): K nearest by
  * (cosine DESC, neighbor_id) → per-label (votes, best_rank) → winner by
  * (votes DESC, best_rank ASC, label ASC). The best_rank tiebreak makes
  * the vote nearest-dominated instead of falling straight to the label
  * ordering; every comparison is on integers or engine-identical doubles
  * (the sequential 64-term dot product, see SimilarityOps).
  */
object LabelOps {
  import Tables.table
  import SimilarityOps.{dot, withNorm, axisBandKey, AxisBits, NumQueries}

  /** Neighbors consulted per pseudo-label vote. */
  private val VoteK = 10

  /** `vec_id % HoldMod == 0` → synthesized-unlabeled (matches the
    * ClassifyOps holdout convention). */
  private val HoldMod = 5L

  /** The brute-force lane's labeling BUDGET: its contract is the
    * bounded-batch regime, so the batch is bounded by construction —
    * `vec_id < BatchCap` on top of the holdout modulus. Covers every
    * holdout vector at the gate SFs (≤ 2k ids), caps the broadcast side
    * at stress/production sizes where an unbounded 20% batch would turn
    * the one-scan plan quadratic (measured: 89.6 s at the 20k-vector
    * stress fixture before the cap — see PERF.md round 14). */
  private val BatchCap = 2000L

  /** Hard negatives returned per anchor. */
  private val NegK = 5

  /** The (unlabeled-batch, labeled-corpus) split with norms. */
  private def holdoutSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = withNorm(table(spark, dir, "embeddings"))
    val unl = e.filter(col("vec_id") % HoldMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val lab = e.filter(col("vec_id") % HoldMod =!= 0)
    (unl, lab)
  }

  /** Shared vote+census tail: scored (query_id, true_label, nlabel,
    * neighbor_id, cosine) candidate rows → per-query winner → per
    * (true_label, pred_label) census with share-of-true in per-mille.
    * `allQueries` re-attaches queries whose candidate set came up empty
    * (possible under LSH probing) as pred_label = -1 so coverage loss is
    * visible in the gated output instead of silently vanishing. */
  private def voteCensus(scored: DataFrame, allQueries: DataFrame): DataFrame = {
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= VoteK)
    voteCensusFromTopk(topk, allQueries)
  }

  /** The winner of a ranked top-k's majority vote, per query:
    * (query_id, pred0). Shared by the census lanes and the streaming
    * pseudo-label serve ([[graft.streaming.DocStream]]). */
  private[graft] def predFromTopk(topk: DataFrame): DataFrame = {
    val votes = topk.groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("best"))
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("best").asc, col("nlabel").asc)
    votes.withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("nlabel").as("pred0"))
  }

  /** The vote tail alone, for callers whose top-k is already ranked (the
    * persisted-index lane): topk (query_id, true_label, nlabel, rank) →
    * census. */
  private def voteCensusFromTopk(topk: DataFrame, allQueries: DataFrame): DataFrame = {
    val pred = predFromTopk(topk)
    val full = allQueries.select(col("query_id"), col("true_label"))
      .join(pred, Seq("query_id"), "left")
      .select(col("true_label"), coalesce(col("pred0"), lit(-1)).as("pred_label"))
    // share-of-true via a window over the CENSUS (≤ labels² rows), not a
    // second aggregate over `full` — Spark plans no common-subtree reuse,
    // so a join against a separately-derived per-true total would run the
    // whole scoring subtree (the expensive part) twice
    full.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_pm",
        expr("(n_docs * 1000) div sum(n_docs) over (partition by true_label)"))
  }

  // --- q_knn_label_prop: exact kNN majority-vote pseudo-labeling ---------
  private def qKnnLabelProp(spark: SparkSession, dir: String): DataFrame = {
    val (unl0, lab) = holdoutSplit(spark, dir)
    val unl = unl0.filter(col("query_id") < BatchCap)
    // the batch is the broadcast side; the labeled corpus is scanned once
    // (an explicit BroadcastNestedLoopJoin over mod-disjoint sets — every
    // labeled row scores against every batch anchor, like q_ann_cosine_topk)
    val scored = lab.crossJoin(broadcast(unl))
      .select(col("query_id"), col("true_label"), col("label").as("nlabel"),
        col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    voteCensus(scored, unl)
  }

  /** DuckDB norm/dot preamble shared by the lanes (64-dim fixture). */
  private val ESql =
    """e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN embedding::DOUBLE[]]), (a,x) -> a+x)) AS norm
      |  FROM embeddings)""".stripMargin

  private def censusSql(scoredCte: String): String =
    s"""$scoredCte,
       |topk AS (SELECT * FROM (
       |    SELECT query_id, true_label, nlabel,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |    FROM scored) t
       |  WHERE rank <= $VoteK),
       |votes AS (
       |  SELECT query_id, true_label, nlabel,
       |    CAST(COUNT(*) AS BIGINT) AS n_votes, MIN(rank) AS best
       |  FROM topk GROUP BY 1, 2, 3),
       |pred AS (SELECT query_id, nlabel AS pred0 FROM (
       |    SELECT query_id, nlabel, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY n_votes DESC, best ASC, nlabel ASC) AS vr
       |    FROM votes) t
       |  WHERE vr = 1),
       |full_p AS (
       |  SELECT u.true_label, COALESCE(p.pred0, -1) AS pred_label
       |  FROM unl u LEFT JOIN pred p USING (query_id)),
       |census AS (
       |  SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM full_p GROUP BY 1, 2)
       |SELECT true_label, pred_label, n_docs,
       |  CAST((n_docs * 1000) // SUM(n_docs) OVER (PARTITION BY true_label)
       |    AS BIGINT) AS share_pm
       |FROM census""".stripMargin

  private val qKnnLabelPropSql = censusSql(
    s"""WITH $ESql,
       |unl AS (
       |  SELECT vec_id AS query_id, label AS true_label, v AS qv, norm AS qnorm
       |  FROM e WHERE vec_id % $HoldMod = 0 AND vec_id < $BatchCap),
       |lab AS (SELECT * FROM e WHERE vec_id % $HoldMod <> 0),
       |scored AS (
       |  SELECT u.query_id, u.true_label, l.label AS nlabel, l.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(0.0, [u.qv[i]*l.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      / (u.qnorm * l.norm) AS cosine
       |  FROM lab l CROSS JOIN unl u)""".stripMargin)

  /** Axis-sign cell key over the first `bits` components — identical to
    * [[SimilarityOps.axisBandKey]](v, 0) at the gate geometry (bits = 4),
    * generalized for the scaled dispatch below. */
  private def cellKey(v: org.apache.spark.sql.Column, bits: Int) =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Cell-count dispatch, the [[SimilarityOps.centRowsAuto]] discipline:
    * the oracle-pinned 4-bit geometry at the gate SFs; above the scale
    * threshold, bits grow with the corpus toward a ~128-vector target
    * cell (bits ≈ log2(n/128), capped at 16) — a FIXED cell count makes
    * the per-cell vote quadratic in corpus size (measured: 36.5 s at the
    * 20k-vector stress before the dispatch — PERF.md round 14). */
  private[graft] def lshBitsFor(n: Long): Int =
    if (n < SimilarityOps.IvfScaleThreshold) AxisBits
    else {
      val cells = math.max(2L, n / 128L)
      math.min(16, math.max(AxisBits,
        64 - java.lang.Long.numberOfLeadingZeros(cells - 1)))
    }

  // --- q_label_prop_lsh: bucket-join propagation (the any-fraction shape) -
  private def qLabelPropLsh(spark: SparkSession, dir: String): DataFrame = {
    val (unl, lab) = holdoutSplit(spark, dir)
    val bits = lshBitsFor(table(spark, dir, "embeddings").count())
    val labC = lab.withColumn("cell", cellKey(col("v"), bits))
    // query probes its own cell plus every Hamming-1 flip
    val probes = unl
      .withColumn("cell0", cellKey(col("qv"), bits))
      .select(col("query_id"), col("true_label"), col("qv"), col("qnorm"),
        explode(array((col("cell0") +: (0 until bits).map(j =>
          col("cell0").bitwiseXOR(lit(1L << j)))): _*)).as("cell"))
    // deliberately no broadcast() HINT: the join is declared on the cell
    // key, so when the unlabeled side outgrows the broadcast threshold
    // the planner falls back to a shuffle join both sides partition for —
    // the plan that survives an unlabeled side of any size (at fixture
    // scale the optimizer still picks a broadcast-hash join off its size
    // estimate, which is exactly the AQE-era contract: declare the key,
    // let stats pick the strategy)
    val scored = labC.join(probes, Seq("cell"))
      .select(col("query_id"), col("true_label"), col("label").as("nlabel"),
        col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    voteCensus(scored, unl)
  }

  // ORACLE COMPARABILITY BOUND: this SQL pins the 4-bit gate geometry,
  // while the Spark side dispatches bits by live corpus size (lshBitsFor)
  // — identical below IvfScaleThreshold (10k vectors), where every gate
  // fixture lives (pinned by LabelEvalOpsSpec's comparability guard).
  // Above it the lane is bench-only; the hash gate must not run there.
  private val qLabelPropLshSql = {
    val keyExpr = (0 until AxisBits).map(j =>
      s"(CASE WHEN v[${j + 1}] > 0.0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    val qKeyExpr = (0 until AxisBits).map(j =>
      s"(CASE WHEN qv[${j + 1}] > 0.0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    censusSql(
      s"""WITH $ESql,
         |unl AS (
         |  SELECT vec_id AS query_id, label AS true_label, v AS qv, norm AS qnorm
         |  FROM e WHERE vec_id % $HoldMod = 0),
         |lab AS (
         |  SELECT vec_id, label, v, norm, CAST($keyExpr AS BIGINT) AS cell
         |  FROM e WHERE vec_id % $HoldMod <> 0),
         |probes AS (
         |  SELECT query_id, true_label, qv, qnorm, p.p AS cell
         |  FROM (SELECT *, CAST($qKeyExpr AS BIGINT) AS cell0 FROM unl) u,
         |    UNNEST([cell0, ${(0 until AxisBits).map(j => s"xor(cell0, ${1L << j})").mkString(", ")}]) AS p(p)),
         |scored AS (
         |  SELECT p.query_id, p.true_label, l.label AS nlabel, l.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(0.0, [p.qv[i]*l.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
         |      / (p.qnorm * l.norm) AS cosine
         |  FROM lab l JOIN probes p USING (cell))""".stripMargin)
  }

  // --- q_label_prop_ivf: learned-quantizer cell-probed propagation -------
  // The third regime: the corpus already carries a trained IVF quantizer
  // (the ANN family's), so the vote searches only each query's nprobe
  // nearest cells — per-query work bounded by cell size like every IVF
  // read, and the cell join is declared on the cluster key (the LSH
  // lane's contract). Candidates are pruned to LABELED members BEFORE
  // scoring (the filtered-vector-search candidate-stage discipline); the
  // 80% labeled complement makes the starvation arithmetic statically
  // satisfied, so the fixed-depth probe plan is the certified one.
  private def qLabelPropIvf(spark: SparkSession, dir: String): DataFrame = {
    // geometry dispatch (centRowsAuto): the oracle-pinned k=10 label-cell
    // training at the gate SFs, √N hash-init cells above the threshold —
    // the SAME dispatch the persisted store builds with, so inline ≡
    // indexed at every size, and the per-cell vote stays ~cell-sized
    // instead of n/10 (measured 13.4 s at the 20k stress before this)
    val rows = SimilarityOps.centRowsAuto(spark, dir)
    import spark.implicits._
    val cent = rows.toDF("cluster", "cv")
    // fan = false: the vote's first real operation is the cluster-keyed
    // join exchange, so the round-robin fan-out was pure cost (r16
    // verdict #1: +30% on this lane)
    val e = withNorm(table(spark, dir, "embeddings"), fan = false)
      .withColumn("cluster", SimilarityOps.assignExpr(rows, col("v")))
    val unl = e.filter(col("vec_id") % HoldMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val probes = unl
      .crossJoin(broadcast(cent))
      .withColumn("cr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(SimilarityOps.dist2(col("qv"), col("cv")), col("cluster"))))
      .filter(col("cr") <= SimilarityOps.autoNProbe(rows.size))
      .select(col("query_id"), col("true_label"), col("qv"), col("qnorm"),
        col("cluster"))
    val scored = e.filter(col("vec_id") % HoldMod =!= 0)
      .join(probes, Seq("cluster"))
      .select(col("query_id"), col("true_label"), col("label").as("nlabel"),
        col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    voteCensus(scored, unl)
  }

  private val qLabelPropIvfSql = {
    val d2qc = "list_reduce(list_prepend(0.0, [(q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]) FOR i IN range(1, 65)]), (acc,d) -> acc+d)"
    censusSql(
      s"""WITH ${SimilarityOps.ivfLearnedCtes},
         |unl AS (
         |  SELECT vec_id AS query_id, label AS true_label
         |  FROM e WHERE vec_id % $HoldMod = 0),
         |probes AS (
         |  SELECT query_id, qv, qnorm, cluster FROM (
         |    SELECT q.vec_id AS query_id, q.v AS qv, q.norm AS qnorm, c.cluster,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY $d2qc, c.cluster) AS cr
         |    FROM e q, c${SimilarityOps.IvfIters} c WHERE q.vec_id % $HoldMod = 0) t
         |  WHERE cr <= ${SimilarityOps.IvfNProbe}),
         |scored AS (
         |  SELECT p.query_id, u.true_label, e.label AS nlabel,
         |    e.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(0.0, [p.qv[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
         |      / (p.qnorm * e.norm) AS cosine
         |  FROM e JOIN a${SimilarityOps.IvfIters} cells ON e.vec_id = cells.vec_id
         |  JOIN probes p ON cells.cluster = p.cluster
         |  JOIN unl u ON u.query_id = p.query_id
         |  WHERE e.vec_id % $HoldMod <> 0)""".stripMargin)
  }

  // --- q_label_prop_ivf_indexed: the same vote at production cadence -----
  // Served from the PERSISTED IVF store (built once per corpus identity,
  // the q_ann_ivf_indexed family): probes read only the probed cluster=C
  // directories, the labeled-members predicate prunes the candidate scan,
  // and the output is row-identical to the inline lane, so it rides the
  // same unrolled-training oracle.
  private def qLabelPropIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val store = IvfIndex.ensureIndex(spark, dir)
    val topk = IvfIndex.topKIndexed(spark, store,
      memberFilter = Some(col("vec_id") % HoldMod =!= 0),
      queryPred = col("vec_id") % HoldMod === 0,
      k = VoteK, fixedProbes = true)
    val labels = table(spark, dir, "embeddings").select(col("vec_id"), col("label"))
    val unl = labels.filter(col("vec_id") % HoldMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"))
    val withLabels = topk
      .join(broadcast(unl), "query_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel")),
        "neighbor_id")
      .select(col("query_id"), col("true_label"), col("nlabel"), col("rank"))
    voteCensusFromTopk(withLabels, unl)
  }

  // --- q_hard_negatives: different-label top-k for contrastive training --
  // For each anchor in the bounded query set, the K highest-cosine
  // neighbors whose label DIFFERS — the "hardest" negatives an embedding
  // trainer mines for triplet/contrastive batches. Same broadcast-anchor
  // single-corpus-scan shape as q_ann_cosine_topk; the label inequality
  // is pushed into the join condition so rejected pairs never reach the
  // window.
  private def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(table(spark, dir, "embeddings"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.join(broadcast(q), col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= NegK)
  }

  private val qHardNegativesSql =
    s"""WITH $ESql,
       |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, norm AS qnorm
       |      FROM e WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(0.0, [q.qv[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      / (q.qnorm * e.norm) AS cosine
       |  FROM e JOIN q ON e.label != q.qlabel)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $NegK""".stripMargin

  // --- Serving: pseudo-label EXTERNAL vectors from the persisted store ---
  /** Ranked VoteK nearest store members for a batch of vectors that are
    * NOT in the store (the ingest-time auto-labeling shape): probing is
    * DISTRIBUTED (batch × broadcast centroid table — no driver collect of
    * the batch, unlike topKIndexed's bounded-query contract), the probed
    * cell set collapses to ≤ k distinct ids driver-side to prune the read
    * to explicit `cluster=C` paths, and candidates meet probes in a join
    * declared on the cell key. Returns (query_id, neighbor_id, rank). */
  private[graft] def serveTopkFromStore(
      spark: SparkSession, store: String, batch: DataFrame): DataFrame = {
    import spark.implicits._
    val cents = IvfIndex.readCentroids(spark, store)
    val cent = cents.toDF("cluster", "cv")
    val np = SimilarityOps.autoNProbe(cents.size)
    val q = batch
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"),
          x => x.cast(org.apache.spark.sql.types.DoubleType)).as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(SimilarityOps.dist2(col("qv"), col("cv")), col("cluster"))))
      .filter(col("cr") <= np)
      .select(col("query_id"), col("qv"), col("qnorm"),
        col("cluster").as("cl"))
    // the probed CELL set is model-bounded (≤ k ids) even when the batch
    // is not — collapsing it driver-side keeps the explicit-paths read
    val probedCells = probes.select(col("cl")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val dirs = IvfIndex.probedDirPaths(spark, store, probedCells)
    if (dirs.isEmpty)
      return spark.emptyDataset[(Long, Long, Long)]
        .toDF("query_id", "neighbor_id", "rank")
    val cand = IvfIndex.minusTombstones(spark, store,
      spark.read.parquet(dirs: _*)
        .select(col("vec_id"), col("v"), col("norm"), col("cl")))
      .dropDuplicates("vec_id") // compaction-window double-epoch tolerance
    val scored = cand.join(probes, Seq("cl"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= VoteK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Pseudo-labels for an external batch: serve the top-k from the store,
    * attach the corpus labels, vote. One row per input vector —
    * abstentions (no candidate in any probed cell) are explicit as
    * pred_label = -1, the census lanes' convention. */
  private[graft] def pseudoLabels(
      spark: SparkSession, corpusDir: String, store: String,
      batch: DataFrame): DataFrame = {
    val topk = serveTopkFromStore(spark, store, batch)
    val labels = table(spark, corpusDir, "embeddings")
      .select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"))
    val pred = predFromTopk(topk.join(labels, "neighbor_id"))
    batch.select(col("vec_id"))
      .join(pred, col("vec_id") === col("query_id"), "left")
      .select(col("vec_id"), coalesce(col("pred0"), lit(-1)).as("pred_label"))
  }

  // --- q_semantic_contamination: embedding-level eval-leakage census -----
  // The semantic complement of the lexical decontamination family
  // (q_decontaminate*): an eval item whose paraphrase survives n-gram
  // dedup still leaks through a τ-cosine neighborhood. Eval set = the
  // bounded query vectors (the q_ann_* stand-in for benchmark
  // embeddings); a corpus vector is contaminated iff ANY eval vector
  // sits at cosine ≥ τ. Same broadcast-eval single-corpus-scan shape as
  // q_hard_negatives — the EXISTS is an early-out semi join, never a
  // top-k. τ = 0.35 ≈ the fixture's 99.9th cosine percentile (the
  // q_semantic_dedup calibration note: the synthetic corpus has no true
  // paraphrases, the operator SHAPE is what transfers). Census per
  // label: flagged/total/share in per-mille — class-bounded output.
  private[operators] val ContamTau = 0.35

  /** Corpus with PRE-NORMALIZED vectors, so the τ-compare is a plain dot
    * — the exact arithmetic [[SimilarityOps]]' q_semantic_dedup uses
    * (each element x_i/‖x‖ rounds once, then one left fold; NOT
    * dot/(‖a‖·‖b‖), whose final ulps depend on the engine's division
    * order and flipped the driver's gate in round 14). */
  private[operators] def contamCorpus(spark: SparkSession, dir: String): DataFrame =
    withNorm(table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label"),
        transform(col("v"),
          x => when(col("norm") > 0.0, x / col("norm")).otherwise(0.0)).as("nv"))

  private def qSemanticContamination(spark: SparkSession, dir: String): DataFrame = {
    val e = contamCorpus(spark, dir)
    val evalSet = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("eval_id"), col("nv").as("qnv"))
    val flagged = e.join(broadcast(evalSet),
        col("vec_id") =!= col("eval_id") &&
          dot(col("qnv"), col("nv")) >= ContamTau,
        "left_semi")
      .select(col("vec_id")).withColumn("flag", lit(1L))
    e.select(col("vec_id"), col("label"))
      .join(flagged, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("flag"), lit(0L))).as("n_flagged"))
      .withColumn("share_pm", expr("(n_flagged * 1000) div n_total"))
  }

  private val qSemanticContaminationSql =
    s"""WITH $ESql,
       |en AS (SELECT vec_id, label,
       |  [CASE WHEN norm > 0.0 THEN xi / norm ELSE 0.0 END FOR xi IN v] AS nv
       |  FROM e),
       |ev AS (SELECT vec_id AS eval_id, nv AS qnv
       |       FROM en WHERE vec_id < $NumQueries),
       |flagged AS (
       |  SELECT DISTINCT en.vec_id FROM en JOIN ev ON en.vec_id != ev.eval_id
       |  WHERE list_reduce(list_prepend(0.0, [ev.qnv[i]*en.nv[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      >= $ContamTau)
       |SELECT en.label, CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_flagged,
       |  CAST((SUM(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000)
       |    // COUNT(*) AS BIGINT) AS share_pm
       |FROM en LEFT JOIN flagged f ON f.vec_id = en.vec_id
       |GROUP BY 1""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_knn_label_prop", qKnnLabelProp, Some(qKnnLabelPropSql)),
    QueryDef("q_label_prop_lsh", qLabelPropLsh, Some(qLabelPropLshSql)),
    QueryDef("q_label_prop_ivf", qLabelPropIvf, Some(qLabelPropIvfSql)),
    QueryDef("q_label_prop_ivf_indexed", qLabelPropIvfIndexed,
      Some(qLabelPropIvfSql)),
    QueryDef("q_hard_negatives", qHardNegatives, Some(qHardNegativesSql)),
    QueryDef("q_semantic_contamination", qSemanticContamination,
      Some(qSemanticContaminationSql)))
}
