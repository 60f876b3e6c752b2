package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q_curation2 — the round-8 curation funnel, composing the round-7
  * signal operators END TO END the way a production pipeline runs them
  * (q_curation predates all of them and gates on length/stopwords only):
  *
  *   1_total      every document
  *   2_quality    char-diversity gate (n_distinct_chars, top-char share —
  *                the q_char_diversity signals) + minimum token count
  *   3_classifier bag-of-words classifier self-consistency: the model
  *                trained on the deterministic train split must predict
  *                the document's recorded lang (q_classify_freq's exact
  *                train→predict loop, target widened to ALL docs)
  *   4_ccnet      CCNet head/middle selection from sampled LM-fit
  *                terciles (q_ccnet_buckets) — the tail is dropped
  *   5_dedup      exact-duplicate keeper + winnowing/MOSS near-dup
  *                removal AMONG THE SURVIVORS (matches are computed on
  *                the stage-4 output, the real pipeline order; losers
  *                are the match report's dominated side)
  *   6_train      the 80% hash-bucket train split (q_train_split's
  *                arithmetic)
  *
  * Output is the attrition ledger (stage, n_docs, n_tokens) — one row
  * per stage, zero-total stages included, so the whole funnel is ONE
  * hash-gated relation. The oracle is the same chain in DuckDB, nesting
  * the already-oracle-green component queries (classifier, CCNet,
  * winnow matching) as subqueries — the composition is verified, not
  * just the parts.
  *
  * Scale shape: every signal is computed once per corpus scan (or per
  * DISTINCT text for the text-pure ones); gates are cumulative boolean
  * columns on one frame; the only stage that recomputes anything on a
  * SUBSET is dedup, whose winnowing input is the already-filtered
  * survivor set (smaller than the corpus by construction).
  */
object CurationFunnel {
  import Tables.table

  private val MinToks = 20L
  private val MinDistinctChars = 18L
  private val MaxTopCharPermille = 195L

  /** q_curation2 — the CERTIFICATION lane (restructured in round 14; the
    * r13 verdict: the full-corpus inline ablation was 6.17 s, 5.6% of
    * suite wall, "certify indexed≡inline on a deterministic sub-corpus
    * sample — the certificate needs identity of outputs, not full-corpus
    * cost"). The lane now
    *
    *  1. runs [[certifySampled]]: the ENTIRE funnel both ways — inline
    *     retraining vs persisted-store serving (stores + votes artifact
    *     built for the sample corpus by the production machinery) — over
    *     a deterministic 1/8 sub-corpus, BOTH sides trained on the same
    *     sample (model state is corpus-level, so the identity is only
    *     defined with a common training corpus), throwing loudly on any
    *     divergence; then
    *  2. serves the full-corpus ledger through the same store-backed
    *     path as `q_curation2_indexed` — which rides this very oracle,
    *     so the OUTPUT stays hash-gated against DuckDB's independent
    *     full inline recomputation at every Verify run.
    *
    * What the certificate still exercises at bench SF every run, beyond
    * the fixed-fixture [[graft.operators.IndexedFunnelSpec]]: store
    * build+serve arithmetic identity, survivor-restricted fingerprint
    * plumbing, votes materialization + staleness, at data sizes that
    * scale with the SF under test. The recurring cost is the sample-
    * sized inline retrain (~1/8 of the old full-corpus ablation) plus
    * two 6-row ledger aggregates. */
  private def qCuration2(spark: SparkSession, dir: String): DataFrame = {
    certifySampled(spark, dir)
    curationLedger(spark, dir, indexed = true)
  }

  /** q_curation2_indexed: the SAME funnel at production cadence — the
    * classifier counts, the bigram-LM model, and the winnowed
    * fingerprints are read from their persisted, stream-maintained
    * stores ([[ClassifyIndex]]/[[LmIndex]]/[[WinnowIndex]], build-if-
    * absent) instead of retrained inline on every invocation. Output is
    * row-identical (the stores train on the same corpus with the same
    * arithmetic — each already proven against the component oracles), so
    * the lane rides qCuration2's oracle; what changes is the cost: warm
    * runs pay scoring + the gate aggregate only, never the three
    * training loops. The one survivor-dependent recomputation that
    * CANNOT come from a corpus-level store is kept minimal by
    * construction: the dedup stage needs fingerprints of the stage-4
    * SURVIVORS with survivor-relative representatives and a
    * survivor-relative df-cap, so the indexed lane joins the persisted
    * per-text fingerprint rows to the survivor set (pure id/hash
    * plumbing) and re-derives rep = min surviving doc_id per text — the
    * expensive part (gram hashing + winnow selection per text) is never
    * recomputed. */
  private def qCuration2Indexed(spark: SparkSession, dir: String): DataFrame =
    curationLedger(spark, dir, indexed = true)

  private def curationLedger(
      spark: SparkSession, dir: String, indexed: Boolean): DataFrame = {
    val d = table(spark, dir, "documents")
    if (indexed) {
      // serving cadence: per-doc model VOTES from the persisted votes
      // artifact (scored once at materialization from the stream-
      // maintained stores, the r12 profile's two corpus-token explodes —
      // classifier 1.34 s + LM 1.58 s of the 4.5 s warm lane — amortized
      // away), winnow fingerprints from their store. Row-identical to
      // the inline funnel by construction: the votes ARE storeSignals'
      // outputs, materialized.
      val votes = spark.read.parquet(s"${ensureVotes(spark, dir)}/votes.parquet")
      ledgerOver(spark, d,
        votes.select(col("doc_id"), col("is_correct")),
        votes.select(col("doc_id"), col("bucket")),
        survFpsFromStore(spark, WinnowIndex.ensureIndex(spark, dir)))
    } else inlineLedgerOver(spark, d)
  }

  /** The fully-inline funnel (every model retrained on `d` itself) —
    * the certificate's reference side, and the semantics the oracle
    * restates in DuckDB. */
  private[operators] def inlineLedgerOver(
      spark: SparkSession, d: DataFrame): DataFrame =
    ledgerOver(spark, d,
      ClassifyOps.scoreDocs(d, ClassifyOps.trainCounts(d)),
      TextOps.ccnetBucketsOver(d),
      surv4 => WinnowOps.fpRows(surv4).drop("tid"))

  // --- the sampled indexed≡inline certificate -------------------------

  /** Deterministic sub-corpus membership: xxhash64(doc_id) mod 8 == 3 —
    * unbiased under structured doc_id spaces, identical everywhere. */
  private val SampleMod = 8L
  private val SampleRem = 3L

  private def sampleDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(IndexStamp.identity(
      dir, "documents.parquet", s"funnel-sample-v1-$SampleMod-$SampleRem"))
    StoreRoot.dir(s"graft-fsample-$key")
  }

  /** Materialize-if-absent the sample corpus as a real `documents.parquet`
    * dir (raw source schema, no ts rewrite — both certificate sides read
    * THIS parquet through [[Tables.table]], so they see byte-identical
    * input), keyed by the source corpus identity: a corpus change makes a
    * new sample universe; within one universe the sample is immutable. */
  private[operators] def ensureSampleCorpus(
      spark: SparkSession, dir: String): String = {
    val sdir = sampleDirFor(dir)
    ensureWriter(spark, sdir, "funnel-sample-build")(
      stale = !StoreRoot.exists(spark, s"$sdir/documents.parquet")) {
      val sample = spark.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(xxhash64(col("doc_id")), lit(SampleMod)) === lit(SampleRem))
      AtomicPublish.stageAndRename(
        spark, sdir, ".sample.tmp", "documents.parquet") {
        tmp => sample.write.mode("overwrite").parquet(tmp.toString)
      }
    }
    sdir
  }

  /** The ENSURE-WRITER shape (review r14 — hand-rolled copies drift);
    * body lives in [[DerivedArtifact.ensureWriter]] since round 17 (the
    * LM totals artifacts are its third and fourth user). */
  private def ensureWriter(
      spark: SparkSession, targetDir: String, who: String)(
      stale: => Boolean)(build: => Unit): Unit =
    DerivedArtifact.ensureWriter(spark, targetDir, who)(stale)(build)

  /** Run the funnel BOTH ways over the sample corpus — inline retraining
    * vs the persisted-store/votes serving path (its stores built for the
    * sample dir by the same `ensure*` machinery production uses) — and
    * throw if the ledgers differ in any stage. Output identity through
    * the whole funnel is exactly the inline≡indexed certificate the old
    * full-corpus ablation lane priced at 6+ s per bench run; the sample
    * bounds it while keeping it SF-proportional (the fixed sf0.001 spec
    * can't grow with the data under test).
    *
    * Cost split by what can actually change: the INLINE ledger is a pure
    * function of the sample corpus, which is immutable by construction
    * (keyed by the source corpus identity, written once) — so it is
    * computed once per sample universe and RECORDED in a `_certificate`
    * sidecar; measured at sf0.1, the inline retrain is dominated by
    * per-stage scheduling overhead (~5.7 s for 625 docs vs ~9 s for the
    * full 5000), so shrinking the sample cannot buy what recording does.
    * The INDEXED side — the one that mutates (store appends/takedowns/
    * compacts, votes rebuilds, staleness rules) — is re-served and
    * compared against the record on EVERY invocation: any divergence in
    * the serving machinery, including a silently-wrong votes artifact,
    * fails the lane loudly. An unreadable/absent record recomputes the
    * inline side (one redundant retrain, never a skipped proof). */
  private[operators] def certifySampled(spark: SparkSession, dir: String): Unit = {
    val sdir = ensureSampleCorpus(spark, dir)
    def rows(df: DataFrame): Seq[(String, Long, Long)] =
      df.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // STAMPED fast path (round 17 — the [[SampledCert.certifyStamped]]
    // discipline, q_dedup_incremental/q_moore_lewis precedent): the
    // sampled indexed re-serve is itself a ~20-stage pipeline (votes
    // read + three gate joins + winnow fingerprint plumbing), so its
    // per-serve cost exceeded the proof's information content while the
    // stores stand still. The ledger's served side is a pure function of
    // (sample corpus, votes artifact, winnow store): the votes artifact
    // subsumes the classifier+LM stores (ensureVotes re-materializes it
    // on ANY mutation of either, changing the artifact's files), so a
    // content stamp over (votes dir, winnow dir) — pure filesystem
    // listing, zero Spark jobs — dispatches the proof obligation: stamp
    // unchanged + standing record = standing proof; ANY store mutation
    // flips it and forces the full re-serve (inline recompute on
    // mismatch, as ever). Trade-off, same as certifyStamped's: read-path
    // code drift over an UNTOUCHED store is caught at the next Verify
    // hash gate (this lane and its _indexed twin ride the same DuckDB
    // oracle, independently recomputed fully inline) rather than at
    // serve time.
    val votesDir = ensureVotes(spark, sdir)
    val winDir = WinnowIndex.ensureIndex(spark, sdir)
    val stamp = SampledCert.stampOf(spark, votesDir) +
      SampledCert.stampOf(spark, winDir)
    val recorded = readCertRecord(spark, sdir)
    if (recorded.exists(_._2.contains(stamp))) return
    val indexed = rows(curationLedger(spark, sdir, indexed = true))
    recorded.map(_._1) match {
      case Some(rec) if rec == indexed =>
        // the row proof stands; refresh the stale/absent stamp so the
        // next serve takes the zero-job path
        writeCertRecord(spark, sdir, indexed, stamp)
      case _ =>
        // no record, an unreadable record, or a record the served side no
        // longer matches. The last case is AMBIGUOUS: a genuinely
        // diverged store — or a legitimate semantic change to the funnel
        // itself, which moves both sides identically and would otherwise
        // fail against the stale record forever (self-healing: recompute
        // the inline truth NOW instead of blaming the stores on record
        // evidence alone)
        val inline = rows(inlineLedgerOver(spark, table(spark, sdir, "documents")))
        if (inline != indexed)
          throw new IllegalStateException(
            s"indexed≡inline certificate FAILED on the sampled sub-corpus $sdir:" +
              s" freshly-retrained inline=$inline vs indexed=$indexed — a" +
              " persisted funnel store or the votes artifact diverged from" +
              " its inline-retrained twin")
        writeCertRecord(spark, sdir, inline, stamp)
    }
  }

  private def certPath(sdir: String) =
    new org.apache.hadoop.fs.Path(sdir, "_certificate")

  private val CertHeader = "graft-funnel-certificate-v1"
  private val CertFooter = "end"

  /** Header + 6 rows [+ stamp] + footer; a file missing ANY of the
    * shapes (crash-truncated write, concurrent non-atomic observation, a
    * pre-upgrade layout) reads as None → the caller recomputes the
    * inline side — one redundant retrain, never a wrong reference. A
    * pre-stamp 8-line record reads as (rows, None): the row proof is
    * honored, the stamp refreshed on the next serve. */
  private def readCertRecord(
      spark: SparkSession, sdir: String
  ): Option[(Seq[(String, Long, Long)], Option[String])] = {
    val p = certPath(sdir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try FsText.read(fs, p).flatMap { txt =>
      val lines = txt.linesIterator.filter(_.nonEmpty).toSeq
      if ((lines.size != 8 && lines.size != 9) ||
        lines.head != CertHeader || lines.last != CertFooter)
        None
      else Some((lines.slice(1, 7).map { l =>
        val Array(s, n, t) = l.split(','); (s, n.toLong, t.toLong)
      }, if (lines.size == 9) Some(lines(7)) else None))
    } catch { case _: MatchError | _: NumberFormatException => None }
  }

  /** Staged sibling + rename — a crash mid-write leaves the previous
    * record (or nothing) behind, never a half-written one; the brief
    * delete-to-rename absent window reads as "no record" (recompute),
    * which is safe in the direction that matters. */
  private def writeCertRecord(
      spark: SparkSession, sdir: String,
      rows: Seq[(String, Long, Long)], stamp: String): Unit = {
    val p = certPath(sdir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FsText.writeAtomic(fs, p,
      ((CertHeader +: rows.map { case (s, n, t) => s"$s,$n,$t" }) ++
        Seq(stamp, CertFooter)).mkString("\n"))
  }

  /** The funnel ledger over an arbitrary documents frame, every model
    * read from its PERSISTED store — shared by `q_curation2_indexed` and
    * the curation-at-ingest streaming lane
    * ([[graft.streaming.DocStream.curationFunnelStream]]), whose
    * cumulative ledger equals this over the arrived union because the
    * three stores are append≡rebuild exact. `docs` needs (doc_id, text,
    * lang, source). */
  private[graft] def storesLedger(
      spark: SparkSession, docs: DataFrame,
      clfDir: String, lmDir: String, winDir: String): DataFrame = {
    val (preds, buckets, fps) = storeSignals(spark, docs, clfDir, lmDir, winDir)
    ledgerOver(spark, docs, preds, buckets, fps)
  }

  /** The three model-backed funnel signals read from their persisted
    * stores — shared by the indexed ledger and the curated-corpus
    * materializer. */
  private def storeSignals(
      spark: SparkSession, docs: DataFrame,
      clfDir: String, lmDir: String, winDir: String)
      : (DataFrame, DataFrame, DataFrame => DataFrame) = (
    ClassifyOps.scoreDocs(docs, ClassifyIndex.modelCounts(spark, clfDir)),
    TextOps.ccnetBucketsFrom(docs, dd => LmIndex.scoreDocs(spark, dd, lmDir)),
    survFpsFromStore(spark, winDir))

  /** Survivor-relative fingerprint rows from the persisted winnow store:
    * selection is a pure function of the text, so restricting the
    * store's rows to survivor tids reproduces `fpRows(surv4)` exactly
    * (modulo rep, re-derived here as min surviving doc_id per text) —
    * the ONE survivor-dependent recomputation the funnel cannot read
    * from a corpus-level store, kept to pure id/hash plumbing. */
  private def survFpsFromStore(
      spark: SparkSession, winDir: String): DataFrame => DataFrame =
    surv4 => {
      val survRep = surv4
        .select(xxhash64(col("text")).as("tid"), col("doc_id"))
        .groupBy(col("tid")).agg(min(col("doc_id")).as("rep"))
      WinnowIndex.fpRowsFromIndex(spark, winDir)
        .select(col("tid"), col("nfp"), col("gh"))
        .join(survRep, "tid")
        .select(col("rep"), col("nfp"), col("gh"))
    }

  // --- persisted per-doc votes: the q_curation2_indexed serving floor --

  private def votesDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(
      IndexStamp.identity(dir, "documents.parquet", "votes-v1"))
    StoreRoot.dir(s"graft-votes-$key")
  }

  /** Newest mtime across each store dir and its two levels of children;
    * body in [[DerivedArtifact.storesMtime]] (round 17). */
  private def storesMtime(spark: SparkSession, dirs: Seq[String]): Long =
    DerivedArtifact.storesMtime(spark, dirs)

  /** The artifact's staleness watermark — a `_watermark` sidecar INSIDE
    * the published parquet dir, carrying the PRE-read stores' mtime;
    * protocol rationale in [[DerivedArtifact]] (round 17). Replaces the
    * r13 `File.setLastModified(preRead)` stamp, whose boolean result was
    * ignored and whose mtime carrier doesn't survive non-local
    * filesystems. Absent sidecar (pre-upgrade artifact) reads as
    * always-stale: one redundant rebuild, never a stale serve. */
  private def writeWatermark(
      spark: SparkSession, stagedDir: org.apache.hadoop.fs.Path,
      preRead: Long): Unit =
    DerivedArtifact.writeWatermark(spark, stagedDir, preRead)

  private def readWatermark(spark: SparkSession, table: String): Option[Long] =
    DerivedArtifact.readWatermark(spark, table)

  /** Materialize-if-absent the per-document model votes
    * `(doc_id, is_correct, bucket)` from the persisted funnel stores —
    * the intermediate the serving lane was recomputing on every
    * invocation: classifier scoring and LM/CCNet bucketing each explode
    * the corpus's tokens once (profiled 1.34 s + 1.58 s of the 4.5 s
    * warm lane at sf0.1, PERF r10/r13), yet both are pure per-doc
    * functions of (corpus, store) — score-at-materialization, serve the
    * narrow column scan. Memoized by corpus identity like every store
    * ([[IndexStamp]]); published atomically. The FULL-outer join keeps
    * the two signals' per-doc null semantics bit-identical to the
    * separate frames the inline funnel joins (a doc missing from one
    * signal coalesces to the same gate default either way). */
  private[graft] def ensureVotes(spark: SparkSession, dir: String): String = {
    val vdir = votesDirFor(dir)
    val clf = ClassifyIndex.ensureModel(spark, dir)
    val lm = LmIndex.ensureModel(spark, dir)
    // rebuild when the artifact is absent OR the stores it was scored
    // from have MUTATED since (a takedown's neg epochs, a compact, a
    // maintenance append — none of which touch the corpus parquet the
    // IndexStamp key covers): the votes must always equal a fresh
    // re-score of the stores as they are NOW
    val votesTable = s"$vdir/votes.parquet"
    // the PRE-read watermark: the artifact carries the stores' newest
    // mtime AS OBSERVED BEFORE the scoring read, not its own publish
    // time — a store mutation landing DURING the multi-second rebuild
    // (scan at T2, publish at T3, takedown at T2<Tm<T3) would otherwise
    // be masked forever by a publish-time stamp ≈T3 > Tm; carrying T2
    // makes the next ensure see Tm > T2 and re-materialize (worst case:
    // one redundant rebuild, never a stale serve)
    ensureWriter(spark, vdir, "votes-build")(
      stale = readWatermark(spark, votesTable)
        .forall(storesMtime(spark, Seq(clf, lm)) > _)) {
      val preRead = storesMtime(spark, Seq(clf, lm))
      val d = table(spark, dir, "documents")
      val (preds, buckets, _) = storeSignals(spark, d, clf, lm,
        WinnowIndex.ensureIndex(spark, dir))
      val votes = preds.select(col("doc_id"), col("is_correct"))
        .join(buckets.select(col("doc_id"), col("bucket")), Seq("doc_id"), "full")
      AtomicPublish.stageAndRename(spark, vdir, ".votes.tmp", "votes.parquet") {
        tmp =>
          votes.write.mode("overwrite").parquet(tmp.toString)
          writeWatermark(spark, tmp, preRead)
      }
      ()
    }
    vdir
  }

  /** The funnel body: gate columns + attrition aggregate over `d`, with
    * the three model-backed signals supplied by the caller (inline
    * retraining, persisted stores, or stream-maintained stores). */
  private def ledgerOver(
      spark: SparkSession, d: DataFrame,
      predsIn: DataFrame, bucketsIn: DataFrame,
      survFpsFor: DataFrame => DataFrame): DataFrame = {
    val (full, cleanup) = gatedOver(d, predsIn, bucketsIn, survFpsFor)
    ledgerFrom(spark, full, cleanup)
  }

  /** The staged gate frame (one row per document, cumulative s2..s6
    * booleans) + the cleanup that releases its cache — the funnel body
    * shared by the ledger aggregate and the curated-corpus
    * materializer. */
  private def gatedOver(
      d: DataFrame,
      predsIn: DataFrame, bucketsIn: DataFrame,
      survFpsFor: DataFrame => DataFrame): (DataFrame, () => Unit) = {
    val nToks = size(split(trim(col("text")), " ")).cast(LongType)

    // per-document char-diversity signals (the q_char_diversity body) —
    // the native single-pass counters ([[graft.functions.CharDiversity]])
    // make this a MAP-ONLY projection, so the round-8 dedup-first
    // explode+groupBy+tid-join (two corpus-char exchanges) is gone;
    // empty text yields [0,0,0] → nd=0, tp=1000, the composed shape's
    // null-fill values
    val preds = predsIn.select(col("doc_id"), col("is_correct"))
    val buckets = bucketsIn.select(col("doc_id"), col("bucket"))

    // persisted: the frame feeds BOTH the dedup stage's survivor set and
    // the final aggregate — without it the classifier + LM + char-signal
    // pipelines evaluate twice (measured 11.6 s vs ~6 s at sf0.1; the
    // bench clears the cache between queries)
    val staged = d
      .select(col("doc_id"), col("text"), nToks.as("n_toks"),
        graft.functions.CharDiversity.stats(col("text")).as("cst"))
      .select(col("doc_id"), col("text"), col("n_toks"),
        element_at(col("cst"), 2).as("nd"),
        expr("CASE WHEN element_at(cst, 1) > 0" +
          " THEN (element_at(cst, 3) * 1000) div element_at(cst, 1)" +
          " ELSE 1000 END").as("tp"))
      .join(preds, Seq("doc_id"), "left")
      .join(buckets, Seq("doc_id"), "left")
      .withColumn("s2",
        col("n_toks") >= MinToks &&
          col("nd") >= MinDistinctChars &&
          col("tp") <= MaxTopCharPermille)
      .withColumn("s3", col("s2") && coalesce(col("is_correct"), lit(0L)) === 1L)
      .withColumn("s4", col("s3") && col("bucket").isin("head", "middle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // dedup among the stage-4 survivors: exact keeper (min doc per text)
    // + winnow-match losers (the dominated side of each reported pair);
    // the fingerprint rows come from the caller (selected on the
    // survivor set inline, or the persisted store's per-text rows
    // restricted to survivor tids — identical by selection purity)
    val surv4 = staged.filter(col("s4")).select(col("doc_id"), col("text"))
    val keepers = surv4.groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
    val losers = WinnowOps
      .matchesFrom(survFpsFor(surv4))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_loser", lit(true))
    val full = staged
      .join(keepers, Seq("text"), "left")
      .join(losers, Seq("doc_id"), "left")
      .withColumn("s5",
        col("s4") && col("doc_id") === col("keep_id") &&
          !coalesce(col("is_loser"), lit(false)))
      .withColumn("s6", col("s5") &&
        pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L)) < 80)

    (full, () => { staged.unpersist(); () })
  }

  /** Aggregate the staged gate frame to the 6-row attrition ledger:
    * collect the ONE total-aggregate row, run `cleanup` (unpersist of
    * the staged frame), and return the ledger as a local relation.
    * Shared by the inline and indexed funnel lanes. */
  private def ledgerFrom(
      spark: SparkSession, full: DataFrame, cleanup: () => Unit): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    def tok(c: org.apache.spark.sql.Column) = sum(when(c, col("n_toks")).otherwise(0L))
    val r =
      try full.agg(
        count(lit(1)).as("n1"), sum(col("n_toks")).as("t1"),
        cnt(col("s2")).as("n2"), tok(col("s2")).as("t2"),
        cnt(col("s3")).as("n3"), tok(col("s3")).as("t3"),
        cnt(col("s4")).as("n4"), tok(col("s4")).as("t4"),
        cnt(col("s5")).as("n5"), tok(col("s5")).as("t5"),
        cnt(col("s6")).as("n6"), tok(col("s6")).as("t6")).head()
      finally cleanup()
    def lv(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    import spark.implicits._
    Seq("1_total", "2_quality", "3_classifier", "4_ccnet", "5_dedup", "6_train")
      .zipWithIndex.map { case (s, i) => (s, lv(2 * i), lv(2 * i + 1)) }
      .toDF("stage", "n_docs", "n_tokens")
  }

  /** The oracle's WITH-chain through `g4` (per-document cumulative gate
    * flags) — shared by the ledger oracle and the curated-pack oracle so
    * the composition is nested, not re-stated. */
  private def funnelCtesSql: String = {
    val winnowOnSurvivors =
      WinnowOps.qWinnowMatchesSql.replace("FROM documents", "FROM s4docs")
    s"""cdiv AS (
       |  SELECT text,
       |    CAST(COUNT(DISTINCT c) AS BIGINT) AS nd,
       |    (MAX(cnt) * 1000) // SUM(cnt) AS tp
       |  FROM (
       |    SELECT text, c, COUNT(*) AS cnt
       |    FROM (SELECT text, substring(text, i, 1) AS c
       |          FROM (SELECT DISTINCT text FROM documents WHERE length(text) > 0) t,
       |               UNNEST(range(1, length(text) + 1)) AS r(i))
       |    GROUP BY 1, 2)
       |  GROUP BY text),
       |cls AS (SELECT doc_id, is_correct FROM (${ClassifyOps.predictAllSql})),
       |ccb AS (SELECT doc_id, bucket FROM (${TextOps.qCcnetBucketsSql})),
       |gated AS (
       |  SELECT d.doc_id, d.text,
       |    len(string_split(trim(d.text), ' '))::BIGINT AS n_toks,
       |    (len(string_split(trim(d.text), ' ')) >= $MinToks
       |      AND COALESCE(cdiv.nd, 0) >= $MinDistinctChars
       |      AND COALESCE(cdiv.tp, 1000) <= $MaxTopCharPermille) AS s2f,
       |    COALESCE(cls.is_correct, 0) = 1 AS clf,
       |    COALESCE(ccb.bucket IN ('head', 'middle'), FALSE) AS ccf
       |  FROM documents d
       |  LEFT JOIN cdiv USING (text)
       |  LEFT JOIN cls USING (doc_id)
       |  LEFT JOIN ccb USING (doc_id)),
       |g2 AS (SELECT *, s2f AND clf AS s3f, s2f AND clf AND ccf AS s4f FROM gated),
       |s4docs AS (SELECT doc_id, text FROM g2 WHERE s4f),
       |wlosers AS (SELECT DISTINCT doc_b FROM ($winnowOnSurvivors)),
       |keepers AS (SELECT text, MIN(doc_id) AS keep_id FROM s4docs GROUP BY text),
       |g3 AS (
       |  SELECT g2.*,
       |    (s4f AND g2.doc_id = k.keep_id
       |      AND g2.doc_id NOT IN (SELECT doc_b FROM wlosers)) AS s5f
       |  FROM g2 LEFT JOIN keepers k USING (text)),
       |g4 AS (SELECT *,
       |    (s5f AND (doc_id * 2654435761) % 4294967296 % 100 < 80) AS s6f
       |  FROM g3)""".stripMargin
  }

  private val qCuration2Sql: String =
    s"""WITH $funnelCtesSql
       |SELECT '1_total' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) AS n_tokens FROM g4
       |UNION ALL SELECT '2_quality', COUNT(*),
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) FROM g4 WHERE s2f
       |UNION ALL SELECT '3_classifier', COUNT(*),
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) FROM g4 WHERE s3f
       |UNION ALL SELECT '4_ccnet', COUNT(*),
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) FROM g4 WHERE s4f
       |UNION ALL SELECT '5_dedup', COUNT(*),
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) FROM g4 WHERE s5f
       |UNION ALL SELECT '6_train', COUNT(*),
       |  COALESCE(CAST(SUM(n_toks) AS BIGINT), 0) FROM g4 WHERE s6f""".stripMargin

  // --- q_pack_curated: the funnel's output packed for training ----------
  // The real pipeline order end to end: curate → MATERIALIZE the curated
  // corpus → sequence-pack it. The curated corpus is a first-class
  // artifact (memoized by corpus identity like the index stores, built
  // from the PERSISTED funnel models at production cadence, published
  // atomically), so warm runs read the curated parquet and pay only the
  // pack scan. The oracle nests the funnel's g4 chain and the pack's
  // naive running-sum window in ONE statement — the composition across
  // the two subsystems is itself hash-gated.

  private def curatedDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(IndexStamp.identity(dir, "documents.parquet", "curated-v1"))
    StoreRoot.dir(s"graft-curated-$key")
  }

  /** Materialize-if-absent the 6_train curated corpus (doc_id, source,
    * text) from the persisted funnel stores; returns the artifact dir. */
  private[graft] def ensureCurated(spark: SparkSession, dir: String): String = {
    val cdir = curatedDirFor(dir)
    // same staleness rule + pre-read watermark as the votes artifact:
    // the curated corpus is derived from the clf/LM/winnow stores, so
    // any store mutation (takedown, compact, append) re-materializes
    // it, including one landing during the rebuild window
    val curatedTable = s"$cdir/docs.parquet"
    val stores = Seq(
      ClassifyIndex.ensureModel(spark, dir),
      LmIndex.ensureModel(spark, dir),
      WinnowIndex.ensureIndex(spark, dir))
    ensureWriter(spark, cdir, "curated-build")(
      stale = readWatermark(spark, curatedTable)
        .forall(storesMtime(spark, stores) > _)) {
      val preRead = storesMtime(spark, stores)
      val d = table(spark, dir, "documents")
      // model votes from the persisted votes artifact (scored once,
      // shared with the q_curation2_indexed serving lane), fingerprints
      // from the winnow store
      val votes = spark.read.parquet(s"${ensureVotes(spark, dir)}/votes.parquet")
      val (full, cleanup) = gatedOver(d,
        votes.select(col("doc_id"), col("is_correct")),
        votes.select(col("doc_id"), col("bucket")),
        survFpsFromStore(spark, WinnowIndex.ensureIndex(spark, dir)))
      try {
        val curated = full.filter(col("s6"))
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("doc_id"), col("source"), col("text"))
        AtomicPublish.stageAndRename(
          spark, cdir, ".curated.tmp", "docs.parquet") {
          tmp =>
            curated.write.mode("overwrite").parquet(tmp.toString)
            writeWatermark(spark, tmp, preRead)
        }
        ()
      } finally cleanup()
    }
    cdir
  }

  private def qPackCurated(spark: SparkSession, dir: String): DataFrame =
    PackingOps.chunksOver(
      spark.read.parquet(s"${ensureCurated(spark, dir)}/docs.parquet"))

  private val qPackCuratedSql: String =
    s"""WITH $funnelCtesSql,
       |curated AS (
       |  SELECT g4.doc_id, d.source, g4.n_toks
       |  FROM g4 JOIN documents d ON g4.doc_id = d.doc_id
       |  WHERE s6f),
       |o AS (
       |  SELECT doc_id, source, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tok
       |  FROM curated)
       |SELECT doc_id, source, n_toks,
       |  end_tok - n_toks AS start_tok,
       |  (end_tok - n_toks) // ${PackingOps.WinTokensVal} AS first_win,
       |  (end_tok - 1) // ${PackingOps.WinTokensVal} AS last_win,
       |  (end_tok - 1) // ${PackingOps.WinTokensVal}
       |    - (end_tok - n_toks) // ${PackingOps.WinTokensVal} + 1 AS n_wins
       |FROM o""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_curation2", qCuration2, Some(qCuration2Sql), headline = true),
    QueryDef("q_curation2_indexed", qCuration2Indexed, Some(qCuration2Sql)),
    QueryDef("q_pack_curated", qPackCurated, Some(qPackCuratedSql)))
}
