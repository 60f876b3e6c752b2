package graft.operators

import graft.{QueryDef, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted pack manifest — sequence packing ([[PackingOps]]) as a
  * maintainable store, for the continuous-training cadence: documents
  * keep arriving, and the loader needs every new document's absolute
  * token offset and window span WITHOUT re-scanning the corpus. Tenth
  * member of the persisted-index family, and arithmetically the
  * simplest: the only cross-batch state is ONE additive counter per
  * source (tokens packed so far), because prefix sums associate —
  * `batch offsets + resident base ≡ one-shot scan` exactly when batches
  * arrive in (source, doc_id) order.
  *
  * Pack-order semantics are AS-OF ARRIVAL (the loader's real contract —
  * a stream cannot pack around documents it hasn't seen): batches
  * arriving in doc_id order reproduce the one-shot [[PackingOps]]
  * manifest bit for bit (spec-pinned); an out-of-order batch packs at
  * the stream's current tail, which is what a production packer does,
  * and is documented rather than hidden — the one-shot q_pack_chunks
  * over the final corpus is the batch reference with its own (doc_id)
  * order, exactly the [[graft.streaming.EmbedStream]] SemDeDup
  * eager-semantics discipline.
  *
  * Layout under `indexDir` (family conventions: epoch-partitioned,
  * dot-prefixed staging, one rename per table per publish):
  *  - `manifest.parquet/epoch=K`: (doc_id, source, n_toks, start_tok,
  *    end_tok) — the batch's absolute offsets
  *  - `base.parquet/epoch=K`:     (source, btot) — the batch's per-source
  *    token totals (additive; resident base = Σ across epochs)
  *  - `docs.parquet/epoch=K`:     (doc_id) — replay-safe membership ledger
  */
object PackIndex {

  /** Training window length — [[PackingOps.WinTokens]], the single
    * source of truth for the pack arithmetic. */
  private def WinTokens: Long = PackingOps.WinTokensVal

  private def writeEpoch(
      spark: SparkSession, indexDir: String, epoch: Int, manifest: DataFrame): Unit = {
    val root = new Path(indexDir)
    val m = manifest.persist()
    try {
      for ((tab, df) <- Seq(
          "manifest.parquet" -> m,
          "base.parquet" -> m.groupBy(col("source")).agg(sum(col("n_toks")).as("btot")),
          "docs.parquet" -> m.select(col("doc_id")).distinct())) {
        AtomicPublish.stageAndRename(
          spark, new Path(root, tab).toString, s".epoch-$epoch.tmp", s"epoch=$epoch") {
          tmp => df.write.mode("overwrite").parquet(tmp.toString)
        }
      }
    } finally { m.unpersist(); () }
  }

  /** Build (overwrite) the manifest as epoch 0 — the one-shot
    * [[PackingOps.offsets]] scan. */
  def buildIndex(spark: SparkSession, docs: DataFrame, indexDir: String): Unit =
    StoreLock.withLock(spark, indexDir, "pack-build") {
    val root = new Path(indexDir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    writeEpoch(spark, indexDir, 0, PackingOps.offsets(docs))
  }

  /** Fold a batch of new documents in: the batch runs its OWN two-level
    * scan (O(batch)) and shifts by the resident per-source base — one
    * broadcast join, never a corpus re-scan. Caller dedupes batches
    * against [[residentDocIds]]. */
  def appendToIndex(spark: SparkSession, indexDir: String, batch: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "pack-append") {
    val manifest = new Path(indexDir, "manifest.parquet")
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = fs.listStatus(manifest).map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toInt).max + 1
    val base = spark.read.parquet(s"$indexDir/base.parquet")
      .groupBy(col("source")).agg(sum(col("btot")).as("base"))
    val shifted = PackingOps.offsets(batch)
      .join(broadcast(base), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("start_tok") + coalesce(col("base"), lit(0L))).as("start_tok"),
        (col("end_tok") + coalesce(col("base"), lit(0L))).as("end_tok"))
    writeEpoch(spark, indexDir, next, shifted)
  }

  /** Doc_ids already packed (the streaming anti-join target) —
    * tombstoned docs stay here until compaction, the family's shadowing
    * semantics (a deleted doc re-arriving stays dead). */
  def residentDocIds(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/docs.parquet").select(col("doc_id")).distinct()

  /** Takedown: MANIFEST HOLES. The tombstoned documents' windows vanish
    * from every read immediately (the training loader skips the hole);
    * later documents' absolute offsets are deliberately UNCHANGED — the
    * pack positions are already consumed downstream, and re-basing them
    * would re-shuffle every shard after the hole. The per-source `base`
    * totals therefore keep counting retired tokens: base is the STREAM
    * TAIL POSITION, not the resident token sum, and deletion makes the
    * two diverge by exactly the holes' n_toks. O(ids). */
  def deleteFromIndex(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    Tombstones.delete(spark, indexDir, ids, "doc_id")

  /** Fold all epochs into one — manifests union (offsets are absolute,
    * rows dedupe), base totals sum ([[EpochCompact]] swap safety);
    * tombstoned docs fold out of the manifest and the ledger (base keeps
    * the tail position — see [[deleteFromIndex]]), then the tombstones
    * retire. Pending tombstones force the fold even at one epoch. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StoreLock.withLock(spark, indexDir, "pack-compact") {
    val ts = Tombstones.snapshot(spark, indexDir)
    EpochCompact.compactTable(spark, s"$indexDir/manifest.parquet",
      raw => ts.minus(spark, raw.distinct(), "doc_id"), ts.nonEmpty)
    EpochCompact.compactTable(spark, s"$indexDir/base.parquet",
      _.groupBy(col("source")).agg(sum(col("btot")).as("btot")))
    EpochCompact.compactTable(spark, s"$indexDir/docs.parquet",
      raw => ts.minus(spark, raw.distinct(), "doc_id"), ts.nonEmpty)
    ts.clear(spark)
  }

  /** The served per-document manifest: the q_pack_chunks shape (window
    * spans derived from the stored absolute offsets), tombstone-excluded. */
  def chunksFromIndex(spark: SparkSession, indexDir: String): DataFrame =
    Tombstones.minus(spark, indexDir,
      spark.read.parquet(s"$indexDir/manifest.parquet"), "doc_id")
      .select(col("doc_id"), col("source"), col("n_toks"), col("start_tok"),
        expr(s"start_tok div ${WinTokens}L").as("first_win"),
        expr(s"(end_tok - 1) div ${WinTokens}L").as("last_win"))
      .withColumn("n_wins", col("last_win") - col("first_win") + 1L)
      .dropDuplicates("doc_id")

  // --- q_pack_chunks_indexed: the production-cadence serving lane -------
  // Family convention: store memoized by corpus identity, built on first
  // use; repeat invocations read the manifest instead of re-running the
  // corpus prefix scan. Output is row-identical to q_pack_chunks (the
  // store's epoch 0 IS that one-shot scan), so it rides the same oracle.
  private def indexDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(IndexStamp.identity(dir, "documents.parquet", "pack-v1"))
    StoreRoot.dir(s"graft-pack-index-$key")
  }

  /** Build-if-absent against the corpus at `dir`; returns the index dir.
    * Shared with the pack-at-ingest stream for catalog consistency. */
  private[graft] def ensureIndex(spark: SparkSession, dir: String): String = {
    val indexDir = indexDirFor(dir)
    if (!StoreRoot.exists(spark, s"$indexDir/manifest.parquet"))
      buildIndex(spark,
        Tables.table(spark, dir, "documents").select("doc_id", "source", "text"),
        indexDir)
    indexDir
  }

  private def qPackChunksIndexed(spark: SparkSession, dir: String): DataFrame =
    chunksFromIndex(spark, ensureIndex(spark, dir))

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_pack_chunks_indexed", qPackChunksIndexed,
      Some(PackingOps.qPackChunksOracle)))
}
