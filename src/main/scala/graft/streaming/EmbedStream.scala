package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Streaming embedding near-duplicate suppression — the vector-space twin
  * of [[DocStream]]: embedded items (documents, images via their encoder)
  * arrive continuously and semantic duplicates must be flagged AT INGEST.
  *
  * Propose: each vector claims/collides with sign-orthant band buckets
  * (3 bands × 4 axis-sign bits over the first 12 components — the SAME
  * deterministic construction family as the batch q_dedup_embedding
  * banding and q_diversity_sample's orthant key, so stream and batch
  * agree on bucket geometry). Bucket state is one keeper id per active
  * bucket, evicted by event-time TTL. Verify: foreachBatch joins the
  * proposed (keeper, vec) pairs to the resident corpus vectors and keeps
  * exact cosine ≥ threshold — a false band collision never reaches the
  * output, and state is never spent on full vectors (ids only).
  */
object EmbedStream {

  final case class EmbDoc(vec_id: Long, ts: Timestamp, embedding: Seq[Float])

  final case class EmbBandHit(band: Int, bkey: Long, vec_id: Long, ts: Timestamp)

  final case class EmbCandidate(keeper_id: Long, vec_id: Long, band: Int)

  final case class EmbBucketState(keeperId: Long, lastSeenMs: Long)

  val BandBits = 4
  val NumBands = 3

  /** Sign-orthant band key of band `b`: bit j set iff component
    * b*BandBits + j (1-based in the array) is strictly positive. */
  private def bandKey(v: org.apache.spark.sql.Column, b: Int) =
    (0 until BandBits).map { j =>
      when(element_at(v, b * BandBits + j + 1).cast(DoubleType) > 0.0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH propose stage over the embedding stream: (keeper, vec) candidate
    * pairs per band collision; earliest vector deterministically claims
    * each bucket within a micro-batch. */
  def nearDupCandidates(
      spark: SparkSession,
      vecs: DataFrame,
      bucketTtlMs: Long = 60 * 60 * 1000L): Dataset[EmbCandidate] = {
    import spark.implicits._
    vecs
      .select(col("vec_id"), col("ts"),
        explode(array((0 until NumBands).map(b =>
          struct(lit(b).as("band"),
            bandKey(col("embedding"), b).as("bkey"))): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("vec_id"), col("ts"))
      .as[EmbBandHit]
      .withWatermark("ts", "1 hour")
      .groupByKey(h => (h.band, h.bkey))
      .flatMapGroupsWithState[EmbBucketState, EmbCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), batch: Iterator[EmbBandHit], state: GroupState[EmbBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(h => (h.ts.getTime, h.vec_id))
            val out = scala.collection.mutable.ListBuffer.empty[EmbCandidate]
            var cur = state.getOption
            for (h <- sorted) {
              val tMs = h.ts.getTime
              cur match {
                case Some(s) =>
                  if (h.vec_id != s.keeperId)
                    out += EmbCandidate(s.keeperId, h.vec_id, key._1)
                  cur = Some(s.copy(lastSeenMs = math.max(s.lastSeenMs, tMs)))
                case None =>
                  cur = Some(EmbBucketState(h.vec_id, tMs))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeenMs + bucketTtlMs)
            }
            out.iterator
          }
      }
  }

  /** Exact cosine verification of proposed pairs against the corpus —
    * batch-callable (shared by the streaming wiring and standalone use).
    * Cost ∝ |pairs|; the corpus is joined twice on narrow ids. */
  def verifyCandidates(
      corpus: DataFrame, pairs: DataFrame, threshold: Double = 0.99): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorOps.dot(a, b)
    val vecs = corpus.select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val a = vecs.select(col("vec_id").as("keeper_id"),
      col("v").as("va"), col("norm").as("na"))
    val b = vecs.select(col("vec_id"), col("v").as("vb"), col("norm").as("nb"))
    pairs.join(a, "keeper_id").join(b, "vec_id")
      .select(col("keeper_id"), col("vec_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** End-to-end: propose via band-keeper state, exactly verify each
    * micro-batch against the corpus, emit only confirmed semantic dups. */
  def verifiedNearDups(
      spark: SparkSession,
      vecs: DataFrame,
      corpus: DataFrame,
      threshold: Double = 0.99)(emit: DataFrame => Unit): StreamingQuery =
    nearDupCandidates(spark, vecs).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(verifyCandidates(corpus,
          batch.select(col("keeper_id"), col("vec_id")).distinct(), threshold))
        ()
      }
      .start()

  /** Streaming maintenance of the persisted ANN index
    * ([[graft.operators.AnnIndex]]): every micro-batch of arriving vectors
    * is folded in with `appendToIndex`, so similarity queries served from
    * the index see new vectors as soon as their batch commits. Band rows
    * are purely additive, so each append is O(batch) — one staged epoch
    * directory per table published by a single rename, never an index
    * rewrite. With [[ivfIndexMaintenanceStream]] and the doc-side lanes,
    * every persisted index family (dedup shingles, near-dup clusters, ANN
    * bands, IVF cells, LM counts) is stream-maintainable.
    *
    * Replay safety: foreachBatch re-delivers a batch after a failure, and
    * a double append duplicates band rows (query output would survive —
    * candidates are deduped — but the index and epoch count grow), so
    * each batch is first anti-joined against the index's resident
    * vec_ids, making replays no-ops; the streaming twin of the reference
    * loader's skip-already-loaded re-run semantics (main.py:153-168).
    */
  def annIndexMaintenanceStream(
      spark: SparkSession,
      vecs: DataFrame,
      indexDir: String,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery): StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processAnnIndexBatch(spark, indexDir, batch, compactEvery)
      }
      .start()

  /** One micro-batch of [[annIndexMaintenanceStream]] — factored out so
    * the cross-batch contracts (batch-build parity, replay idempotence)
    * are directly testable. */
  private[streaming] def processAnnIndexBatch(
      spark: SparkSession, indexDir: String, batch: DataFrame,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery): Unit = {
    // the index stores (vec_id, v, norm) only — label is withNorm plumbing
    val vecs = batch.select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
      .withColumn("label", lit(0L))
    val vectors = new org.apache.hadoop.fs.Path(s"$indexDir/vectors.parquet")
    val fs = vectors.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(vectors)) {
      // empty micro-batches happen (watermark-only triggers): building an
      // empty index would freeze an all-empty schema — wait for content
      if (!vecs.isEmpty) graft.operators.AnnIndex.buildIndex(spark, vecs, indexDir)
    } else {
      val resident = spark.read.parquet(vectors.toString).select(col("vec_id"))
      val fresh = vecs.join(resident, Seq("vec_id"), "left_anti").persist()
      try {
        if (!fresh.isEmpty) {
          graft.operators.AnnIndex.appendToIndex(spark, indexDir, fresh)
          // policy: bound read amplification — self-compact at the
          // epoch-count threshold (the read-merge, folded to one epoch)
          graft.operators.IndexPolicy.maybeCompact(
            spark, s"$indexDir/bands.parquet", compactEvery) {
            graft.operators.AnnIndex.compact(spark, indexDir)
          }
          ()
        }
      } finally fresh.unpersist()
    }
    ()
  }

  /** Streaming maintenance of the persisted IVF index
    * ([[graft.operators.IvfIndex]]) — the fourth index family's stream
    * lane. The index must already be BUILT (training the coarse quantizer
    * is a batch decision, not a per-trigger one); each micro-batch is
    * assigned map-only against the FROZEN centroids and appended as one
    * O(batch) epoch. Every append also records its assignment tightness,
    * so [[graft.operators.IvfIndex.driftReport]] watches the stream decay
    * the quantizer and flags the retrain (= rebuild) when appended data
    * has drifted past the build-time baseline.
    *
    * Replay safety: same anti-join-resident-vec_ids contract as
    * [[annIndexMaintenanceStream]] — re-delivered batches are no-ops. */
  def ivfIndexMaintenanceStream(
      spark: SparkSession,
      vecs: DataFrame,
      indexDir: String,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery,
      retrainFactor: Double = 0.0): StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processIvfIndexBatch(spark, indexDir, batch, compactEvery, retrainFactor)
      }
      .start()

  /** One micro-batch of [[ivfIndexMaintenanceStream]] — factored out so
    * batch-build parity and replay idempotence are directly testable. */
  private[streaming] def processIvfIndexBatch(
      spark: SparkSession, indexDir: String, batch: DataFrame,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery,
      retrainFactor: Double = 0.0): Unit = {
    val cells = new org.apache.hadoop.fs.Path(s"$indexDir/cells.parquet")
    val fs = cells.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cells))
      throw new IllegalStateException(
        s"IVF maintenance requires a built index at $indexDir — train with " +
          "IvfIndex.buildIndex/buildFromCorpus first")
    val vecs = batch.select(col("vec_id"), col("embedding")).dropDuplicates("vec_id")
    val resident = spark.read.parquet(cells.toString).select(col("vec_id"))
    val fresh = vecs.join(resident, Seq("vec_id"), "left_anti").persist()
    try {
      if (!fresh.isEmpty) {
        graft.operators.IvfIndex.appendToIndex(spark, indexDir, fresh)
        // policy: bound read amplification — self-compact at the
        // epoch-count threshold (the read-merge, folded to one epoch)
        graft.operators.IndexPolicy.maybeCompact(
          spark, s"$indexDir/cells.parquet", compactEvery) {
          graft.operators.IvfIndex.compact(spark, indexDir)
        }
        // drift policy (opt-in, factor > 0): when appended data has
        // decayed the frozen quantizer past the threshold, retrain the
        // store from its own residents and re-arm the baseline
        if (retrainFactor > 0.0)
          graft.operators.IndexPolicy.maybeRetrain(spark, indexDir, retrainFactor)
        ()
      }
    } finally fresh.unpersist()
    ()
  }

  /** Streaming maintenance of the persisted PQ code store
    * ([[graft.operators.PqIndex]]): micro-batches of arriving vectors are
    * code-assigned MAP-ONLY against the frozen on-disk codebook and
    * appended as O(batch) epochs; replays are no-ops via the resident
    * vec_id ledger. Requires a trained index (the quantizer is a model —
    * the IVF-lane contract). Seventh stream-maintained index family. */
  def pqIndexMaintenanceStream(
      spark: SparkSession,
      vecs: DataFrame,
      indexDir: String,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery): StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processPqIndexBatch(spark, indexDir, batch, compactEvery)
      }
      .start()

  /** One micro-batch of [[pqIndexMaintenanceStream]]. */
  private[graft] def processPqIndexBatch(
      spark: SparkSession, indexDir: String, batch: DataFrame,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery): Unit = {
    val codes = new org.apache.hadoop.fs.Path(s"$indexDir/codes.parquet")
    val fs = codes.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(codes))
      throw new IllegalStateException(
        s"PQ maintenance requires a built index at $indexDir — train with " +
          "PqIndex.buildIndex first")
    val vecs = batch.select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
      .withColumn("label", lit(0L))
    val resident = graft.operators.PqIndex.residentVecIds(spark, indexDir)
    val fresh = vecs.join(resident, Seq("vec_id"), "left_anti").persist()
    try {
      if (!fresh.isEmpty) {
        graft.operators.PqIndex.appendToIndex(spark, indexDir, fresh)
        // policy: bound read amplification — self-compact at the
        // epoch-count threshold (the read-merge, folded to one epoch)
        graft.operators.IndexPolicy.maybeCompact(
          spark, s"$indexDir/codes.parquet", compactEvery) {
          graft.operators.PqIndex.compact(spark, indexDir)
        }
        ()
      }
    } finally fresh.unpersist()
    ()
  }

  /** Streaming SemDeDup at ingest (the q_semantic_dedup keep-rule as a
    * maintenance lane over the persisted IVF store): each micro-batch is
    * assigned map-only against the FROZEN centroids, compared against
    * ONLY ITS OWN CLUSTERS' resident survivors (explicit probed cell
    * dirs — never a corpus scan) plus its in-batch same-cluster peers,
    * and each vector's keep/drop decision is appended to `decisionsDir`;
    * only the KEPT vectors fold into the store, so the resident set IS
    * the surviving corpus — the greedy ingest-order SemDeDup. Eager
    * semantics like [[DocStream.winnowMatchStream]]: decisions are as-of
    * arrival (a later, better-centered near-dup does not retro-drop an
    * accepted resident; the one-shot q_semantic_dedup over the final
    * corpus is the batch reference with its own rank order). Replay
    * safety: the resident-ledger anti-join covers KEPT vectors; dropped
    * vec_ids are re-decided identically on re-delivery (same resident
    * state, same rule), appending a duplicate decision row — decisions
    * dedupe by vec_id (spec-pinned). The index must already be BUILT
    * (quantizer training is a batch decision — the IVF-lane contract). */
  def semanticDedupStream(
      spark: SparkSession,
      vecs: DataFrame,
      indexDir: String,
      decisionsDir: String,
      tau: Double,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery,
      reconcileEvery: Int = 0): StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processSemanticDedupBatch(spark, indexDir, decisionsDir, tau, batch,
          compactEvery, reconcileEvery)
      }
      .start()

  /** Reconciliation pass for the streaming SemDeDup store (round-9 —
    * closes the eager-decision drift the round-8 verdict flagged): the
    * stream's keep decisions are as-of arrival, so an adversarial order
    * can admit a DOMINATED survivor (a later, better-centered near-dup
    * is kept beside it instead of replacing it) and the resident set
    * drifts from the batch keep-rule. This pass runs the EXACT
    * q_semantic_dedup rule over the resident survivors — drop any vector
    * with a same-cluster τ-cosine neighbor ranking better by
    * (distance-to-centroid, id) — evicts the violators through the
    * store's own compact rewrite ([[graft.operators.IvfIndex.compactExcluding]]:
    * publish-before-delete, so readers never see a torn store), and
    * appends the evicted ids to `$indexDir/reconcile_audit.parquet`.
    * When `decisionsDir` is given (the stream's policy path always
    * passes it), each eviction ALSO appends a superseding kept=0 row to
    * the decisions ledger, so the ledger alone yields the effective
    * keep set: a vec_id is effectively kept iff it has no kept=0 row
    * (min(kept) per vec_id). Post-eviction re-deliveries re-decide
    * kept=0 — the dominator that caused the eviction is resident — so
    * the superseding row is never contradicted. Because the rewrite IS
    * a compaction, the epoch count folds to one and the policy trigger
    * re-arms. Idempotent: the rule over an already-reconciled store
    * evicts nothing (a second pass is a plain compact). Returns the
    * number of evicted vectors.
    *
    * Cost: the same cluster-bounded pair join as the batch operator —
    * O(Σ per-cell members²), the SemDeDup tractability bound — which is
    * why it is a PERIODIC policy action (`reconcileEvery` epochs), not a
    * per-batch one. */
  def reconcileSemanticDedup(
      spark: SparkSession, indexDir: String, tau: Double,
      decisionsDir: Option[String] = None): Long = {
    val m = spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id"), col("cl").as("cluster"), col("d2c"),
        transform(col("v"),
          x => when(col("norm") > 0.0, x / col("norm")).otherwise(0.0)).as("nv"))
      .dropDuplicates("vec_id")
    val o = m.select(col("cluster").as("ocl"), col("vec_id").as("o_id"),
      col("d2c").as("od2c"), col("nv").as("onv"))
    val evicted = m.join(o,
        col("cluster") === col("ocl") &&
          (col("od2c") < col("d2c") ||
            (col("od2c") === col("d2c") && col("o_id") < col("vec_id"))))
      .filter(graft.functions.VectorOps.dot(col("nv"), col("onv")) >= tau)
      .select(col("vec_id"), col("cluster")).distinct()
      .persist()
    try {
      val n = evicted.count()
      if (n > 0) {
        // audit BEFORE the rewrite: a crash in between re-runs the
        // deterministic rule and re-audits the same rows (consumers
        // dedupe by vec_id); the reverse order could evict silently
        evicted.withColumn("evicted", lit(1L))
          .write.mode("append").parquet(s"$indexDir/reconcile_audit.parquet")
        // supersede the ledger's kept=1 rows so decisionsDir alone
        // yields the effective keep set (min(kept) per vec_id)
        decisionsDir.foreach { dd =>
          evicted.select(col("vec_id"),
              col("cluster").cast(LongType).as("cluster"), lit(0L).as("kept"))
            .write.mode("append").parquet(dd)
        }
      }
      // fold epochs even when nothing was evicted — the trigger fires on
      // epoch count, so the rewrite must re-arm it either way
      graft.operators.IvfIndex.compactExcluding(spark, indexDir,
        if (n > 0) Some(evicted.select(col("vec_id"))) else None)
      n
    } finally { evicted.unpersist(); () }
  }

  /** One micro-batch of [[semanticDedupStream]]. */
  private[graft] def processSemanticDedupBatch(
      spark: SparkSession, indexDir: String, decisionsDir: String,
      tau: Double, batch: DataFrame,
      compactEvery: Int = graft.operators.IndexPolicy.CompactEvery,
      reconcileEvery: Int = 0): Unit = {
    val cells = new org.apache.hadoop.fs.Path(s"$indexDir/cells.parquet")
    val fs = cells.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cells))
      throw new IllegalStateException(
        s"semantic-dedup maintenance requires a built index at $indexDir")
    val raw = batch.select(col("vec_id"), col("embedding")).dropDuplicates("vec_id")
    val resident = spark.read.parquet(cells.toString).select(col("vec_id"))
    val fresh0 = raw.join(resident, Seq("vec_id"), "left_anti")
    val cents = spark.read.parquet(s"$indexDir/centroids.parquet").collect()
      .map(r => (r.get(r.fieldIndex("cluster")).asInstanceOf[Number].longValue,
        r.getSeq[Double](r.fieldIndex("cv"))))
      .toSeq.sortBy(_._1)
    val asg = graft.operators.SimilarityOps.assignStruct(cents,
      transform(col("embedding"), x => x.cast(DoubleType)))
    val fresh = fresh0
      .withColumn("v", transform(col("embedding"), x => x.cast(DoubleType)))
      .withColumn("norm", sqrt(graft.functions.VectorOps.dot(col("v"), col("v"))))
      .select(col("vec_id"), col("embedding"),
        asg.getField("cluster").as("cluster"),
        asg.getField("d2c").as("d2c"),
        transform(col("v"),
          x => when(col("norm") > 0.0, x / col("norm")).otherwise(0.0)).as("nv"))
      .persist()
    try {
      if (!fresh.isEmpty) {
        val batchClusters = fresh.select(col("cluster")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val residentSide = graft.operators.IvfIndex
          .cellMembers(spark, indexDir, batchClusters)
        val side = residentSide
          .unionByName(fresh.select(col("vec_id"), col("cluster"), col("d2c"), col("nv")))
          .select(col("cluster").as("ocl"), col("vec_id").as("o_id"),
            col("d2c").as("od2c"), col("nv").as("onv"))
        val dropped = fresh.join(side,
            col("cluster") === col("ocl") &&
              (col("od2c") < col("d2c") ||
                (col("od2c") === col("d2c") && col("o_id") < col("vec_id"))))
          .filter(graft.functions.VectorOps.dot(col("nv"), col("onv")) >= tau)
          .select(col("vec_id")).distinct()
          .withColumn("is_dropped", lit(1L))
        val decided = fresh.select(col("vec_id"), col("cluster"), col("embedding"))
          .join(dropped, Seq("vec_id"), "left")
          .withColumn("kept", lit(1L) - coalesce(col("is_dropped"), lit(0L)))
          .persist()
        try {
          decided.select(col("vec_id"), col("cluster").cast(LongType).as("cluster"),
            col("kept"))
            .write.mode("append").parquet(decisionsDir)
          val keptBatch = decided.filter(col("kept") === 1L)
            .select(col("vec_id"), col("embedding"))
          if (!keptBatch.isEmpty) {
            graft.operators.IvfIndex.appendToIndex(spark, indexDir, keptBatch)
            // reconcile policy (opt-in, the periodic batch-rule audit):
            // runs FIRST because its rewrite is itself a compaction —
            // when it fires, the compact trigger below sees one epoch
            if (reconcileEvery > 0)
              // pure cadence gate: the reconcile audit is not a
              // deletion-applying compact, so a pending tombstone must
              // not force it every cycle (the compact below handles
              // retiring deletions)
              graft.operators.IndexPolicy.maybeCompact(
                spark, s"$indexDir/cells.parquet", reconcileEvery,
                onPendingDeletes = false) {
                reconcileSemanticDedup(spark, indexDir, tau, Some(decisionsDir))
                ()
              }
            graft.operators.IndexPolicy.maybeCompact(
              spark, s"$indexDir/cells.parquet", compactEvery) {
              graft.operators.IvfIndex.compact(spark, indexDir)
            }
            ()
          }
        } finally decided.unpersist()
      }
    } finally fresh.unpersist()
    ()
  }
}
