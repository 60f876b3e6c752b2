package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental dedup against a PRE-BUILT corpus index.
  *
  * q_dedup_incremental (DedupOps.scala) already avoids old×old pairs, but
  * every run still re-shingles the resident corpus to rebuild the inverted
  * index — at 100 TB that scan dwarfs the batch. The real incremental-ingest
  * shape amortizes it: the corpus index is built ONCE ([[buildIndex]]),
  * maintained by [[appendToIndex]] (fold a verified batch in without a
  * corpus rescan — spec-pinned exactly equal to a full rebuild over the
  * union), and a batch run does only batch-proportional compute plus
  * narrow index scans:
  *
  *   1. batch text work (shingling, copy counts) — batch-sized;
  *   2. df-cap maintenance: the index stores each shingle's copy-weighted
  *      corpus df AND each text's cap-filtered shingle count. Batch copies
  *      only ever ADD df, so the only texts whose counts change are those
  *      containing a shingle the batch pushed over the cap — a tiny,
  *      batch-proportional set, applied as a broadcast-joined correction;
  *   3. candidate generation seeded by batch shingles only: index-side
  *      rows are touched exactly where a bucket collision exists.
  *
  * The run phase takes ONLY (indexDir, batch) — corpus text is unreachable
  * by construction, which is the strongest form of the "no corpus-side
  * re-shingling" guarantee (spec-pinned on the physical plan too).
  *
  * Output contract is IDENTICAL to q_dedup_incremental (same oracle SQL,
  * hash-checked at the gate): df cap over resident+batch copies, jaccard
  * ≥ 0.5, old×new expansion with same-text 1.0 pairs.
  */
object IncrementalDedup {
  import DedupOps.{shingleArrayOf, MaxShingleDf}

  /** The deterministic multiplicative-hash split shared with
    * q_train_split / q_dedup_incremental. */
  def bucketOf(docId: Column): Column =
    pmod(pmod(docId * lit(2654435761L), lit(4294967296L)), lit(100L))

  /** Distinct (tkey, sh) + per-text copy counts for one side. Shingles are
    * carried as xxhash64 LONGS everywhere past the explode: the corpus
    * index and every join/shuffle move 8-byte keys instead of n-gram
    * strings (the same 64-bit-collision contract as the tkey text keys —
    * a collision merely merges two shingles' df, vanishing at ~1e-6 even
    * for 10M-shingle corpora). */
  private def textShingles(docs: DataFrame): (DataFrame, DataFrame) = {
    val t = docs.select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val groups = t.groupBy(col("tkey"))
      .agg(count(lit(1)).as("n_copies"), first(col("text")).as("text"))
    val sh = groups
      .select(col("tkey"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("tkey"), explode(shingleArrayOf(col("w"))).as("s"))
      .select(col("tkey"), xxhash64(col("s")).as("sh"))
    (sh, groups.select(col("tkey"), col("n_copies")))
  }

  /** Build (overwrite) the corpus index for a resident document set. Four
    * narrow parquet tables; document TEXT does not survive into the index.
    *  - text_shingles: distinct (tkey, sh) per resident distinct text
    *                   (sh = xxhash64 of the n-gram — longs, not strings)
    *  - texts:         (tkey, n_copies, n0) — resident copies and the
    *                   corpus-df-capped shingle count
    *  - shingle_df:    (sh, cdf) copy-weighted corpus df
    *  - members:       (doc_id, tkey) resident membership
    */
  def buildIndex(resident: DataFrame, indexDir: String): Unit =
    StoreLock.withLock(resident.sparkSession, indexDir, "incdedup-build") {
    val (sh, texts) = textShingles(resident)
    sh.write.mode("overwrite").parquet(s"$indexDir/text_shingles.parquet")
    val cdf = sh.join(texts, "tkey")
      .groupBy(col("sh")).agg(sum(col("n_copies")).as("cdf"))
    cdf.write.mode("overwrite").parquet(s"$indexDir/shingle_df.parquet")
    val n0 = sh
      // cap as an anti-join against the small HOT set (round 16 §2.3)
      .join(cdf.filter(col("cdf") > MaxShingleDf).select("sh"),
        Seq("sh"), "left_anti")
      .groupBy(col("tkey")).agg(count(lit(1)).as("n0"))
    texts.join(n0, Seq("tkey"), "left")
      .select(col("tkey"), col("n_copies"), coalesce(col("n0"), lit(0L)).as("n0"))
      .write.mode("overwrite").parquet(s"$indexDir/texts.parquet")
    resident.select(col("doc_id"), xxhash64(col("text")).as("tkey"))
      .write.mode("overwrite").parquet(s"$indexDir/members.parquet")
  }

  // explicit index schemas: schema inference on spark.read.parquet costs a
  // footer-reading job per table per run — four wasted jobs on a hot path
  private[operators] val ShSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tkey", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.LongType)))
  private[operators] val TextsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tkey", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_copies", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n0", org.apache.spark.sql.types.LongType)))
  private[operators] val DfSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cdf", org.apache.spark.sql.types.LongType)))
  private[operators] val MembersSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tkey", org.apache.spark.sql.types.LongType)))

  /** The four merged index tables for `indexDir`'s contents ∪ `batch`, as
    * lazy plans over the LIVE index, plus the two batch-proportional text
    * sets every maintenance consumer needs: batch texts not already
    * resident, and resident texts whose capped shingle count changed
    * because the batch pushed one of their shingles over the df cap
    * ([[ClusterIndex]] re-derives exactly these texts' edges). */
  private[operators] final case class MergedBatch(
      sh: DataFrame, df: DataFrame, texts: DataFrame, members: DataFrame,
      newTkeys: DataFrame, droppedTkeys: DataFrame)

  /** Fold a (verified) batch into the index at `indexDir`, so that
    * afterwards the index is EXACTLY `buildIndex(resident ∪ batch)` —
    * without ever touching resident text. All work is batch-proportional
    * plus two narrow index scans:
    *
    *  - shingle_df: outer-merge the batch's copy-weighted df deltas
    *    (batch only ADDS df);
    *  - text_shingles: append shingle rows for batch texts NOT already
    *    resident (a resident text's rows are already there, identical by
    *    construction — same text ⇒ same shingle set);
    *  - texts: n_copies adds; n0 re-corrects exactly the texts containing
    *    a shingle the batch pushed over the cap (a broadcast-joined,
    *    batch-proportional set — the same correction `run` computes
    *    transiently, here made durable), while batch-new texts count their
    *    shingles against the MERGED df;
    *  - members: append the batch (doc_id, tkey) rows.
    *
    * The four tables are rewritten to a temp dir first (reads of the old
    * index complete before anything moves), then swapped in with the
    * two-rename pattern of [[graft.sink.Upsert]] — readers never observe a
    * half-appended index. Appending a batch twice double-counts copies
    * (same as rebuilding over a doubled corpus would); idempotent re-runs
    * dedupe at the doc_id level before calling this, matching the
    * reference's skip-already-loaded semantics (main.py:153-168).
    */
  def appendToIndex(spark: SparkSession, indexDir: String, batch: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "incdedup-append") {
    val m = mergeBatch(spark, indexDir, batch)
    // materialize to tmp FIRST (the plans above read the live index), then
    // atomically swap the whole index directory
    val live = new Path(indexDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(live.getParent, live.getName + ".append-tmp")
    val bak = new Path(live.getParent, live.getName + ".append-bak")
    fs.delete(tmp, true)
    m.sh.write.mode(SaveMode.Overwrite).parquet(s"$tmp/text_shingles.parquet")
    m.df.write.mode(SaveMode.Overwrite).parquet(s"$tmp/shingle_df.parquet")
    m.texts.write.mode(SaveMode.Overwrite).parquet(s"$tmp/texts.parquet")
    m.members.write.mode(SaveMode.Overwrite).parquet(s"$tmp/members.parquet")
    fs.delete(bak, true)
    if (!fs.rename(live, bak))
      throw new java.io.IOException(s"index append swap failed: $live -> $bak")
    if (!fs.rename(tmp, live)) {
      fs.rename(bak, live)
      throw new java.io.IOException(s"index append swap failed: $tmp -> $live")
    }
    fs.delete(bak, true)
  }

  /** The deletion analog of [[MergedBatch]]: the four tables with the
    * victims' contribution subtracted, plus the text sets a derived-
    * table maintainer ([[ClusterIndex]]) needs — texts that vanished
    * entirely (no copies left) and texts whose capped shingle count
    * ROSE because a deletion pulled one of their shingles back under
    * the df cap (the append correction in reverse). */
  private[operators] final case class MergedDelete(
      sh: DataFrame, df: DataFrame, texts: DataFrame, members: DataFrame,
      droppedTkeys: DataFrame, raisedTkeys: DataFrame)

  /** Takedown: subtract `ids` from the index so that afterwards it is
    * EXACTLY `buildIndex(resident − ids)` — from the index alone (the
    * victims' shingle sets are resident by tkey, so no text is needed),
    * in victim-proportional work plus narrow index scans, applied with
    * the same whole-dir swap as [[appendToIndex]]. Idempotent: a
    * replayed takedown finds no members and rewrites nothing. The
    * reverse of the append merge:
    *
    *  - members: drop the victims' (doc_id, tkey) rows;
    *  - texts: n_copies falls by the victim count; a text at zero copies
    *    drops, and its shingle rows leave text_shingles;
    *  - shingle_df: cdf falls copy-weighted; cdf = 0 rows drop (only
    *    shingles of fully-dropped texts can reach 0 — any surviving
    *    containing text keeps cdf ≥ 1);
    *  - n0: texts containing a shingle the deletion pulled back UNDER
    *    the cap gain +1 per such shingle (the cap correction reversed);
    *    fully-dropped texts lose their row outright. */
  def deleteFromIndex(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "incdedup-delete") {
    val m = mergeDelete(spark, indexDir, ids)
    if (m.members eq null) return // nothing resident to delete
    AtomicPublish.swapDir(spark, indexDir,
      tmpSuffix = ".delete-tmp", bakSuffix = ".delete-bak") { tmp =>
      m.sh.write.mode(SaveMode.Overwrite).parquet(s"$tmp/text_shingles.parquet")
      m.df.write.mode(SaveMode.Overwrite).parquet(s"$tmp/shingle_df.parquet")
      m.texts.write.mode(SaveMode.Overwrite).parquet(s"$tmp/texts.parquet")
      m.members.write.mode(SaveMode.Overwrite).parquet(s"$tmp/members.parquet")
    }
  }

  /** The subtraction behind [[deleteFromIndex]], exposed so
    * [[ClusterIndex]] can extend it with its derived tables and swap
    * once. Returns null members when no victim is resident (no-op). */
  private[operators] def mergeDelete(
      spark: SparkSession, indexDir: String, ids: DataFrame): MergedDelete = {
    val corpusSh = spark.read.schema(ShSchema).parquet(s"$indexDir/text_shingles.parquet")
    val corpusTexts = spark.read.schema(TextsSchema).parquet(s"$indexDir/texts.parquet")
    val corpusDf = spark.read.schema(DfSchema).parquet(s"$indexDir/shingle_df.parquet")
    val members = spark.read.schema(MembersSchema).parquet(s"$indexDir/members.parquet")

    // not cached: the victim set is takedown-sized, and callers hold the
    // returned plans across a dir swap where an unpersist window would
    // be easy to get wrong
    val victims = members.join(ids.select(col("doc_id")).distinct(), "doc_id")
    if (victims.isEmpty)
      return MergedDelete(null, null, null, null, null, null)
    // copy loss per text = number of deleted member docs carrying it
    val vcopies = victims.groupBy(col("tkey")).agg(count(lit(1)).as("vcopies"))
    val newTexts0 = corpusTexts.join(vcopies, Seq("tkey"), "left")
      .select(col("tkey"),
        (col("n_copies") - coalesce(col("vcopies"), lit(0L))).as("n_copies"),
        col("n0"))
    val droppedTkeys = newTexts0.filter(col("n_copies") <= 0L).select("tkey")

    // copy-weighted df loss per shingle of any victim text
    val ddf = corpusSh.join(vcopies, "tkey")
      .groupBy(col("sh")).agg(sum(col("vcopies")).as("ddf"))
    val mergedDf = corpusDf.join(ddf, Seq("sh"), "left")
      .select(col("sh"), (col("cdf") - coalesce(col("ddf"), lit(0L))).as("cdf"))
      .filter(col("cdf") > 0L)

    // shingles the deletion pulled back UNDER the cap — victim-
    // proportional (a subset of the victims' own shingles)
    val newlyUnder = corpusDf.join(ddf, "sh")
      .filter(col("cdf") > MaxShingleDf && col("cdf") - col("ddf") <= MaxShingleDf)
      .select("sh")
    // n0 raise: one narrow scan of the shingle index against the
    // broadcast newly-under set (the append drop-correction reversed)
    val raises = corpusSh.join(broadcast(newlyUnder), "sh")
      .groupBy(col("tkey")).agg(count(lit(1)).as("raise"))

    val mergedTexts = newTexts0.filter(col("n_copies") > 0L)
      .join(raises, Seq("tkey"), "left")
      .select(col("tkey"), col("n_copies"),
        (col("n0") + coalesce(col("raise"), lit(0L))).as("n0"))
    val mergedSh = corpusSh.join(droppedTkeys, Seq("tkey"), "left_anti")
    val mergedMembers = members.join(
      victims.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")

    MergedDelete(mergedSh, mergedDf, mergedTexts, mergedMembers,
      droppedTkeys, raises.select("tkey"))
  }

  /** The merge computation behind [[appendToIndex]], exposed so other
    * index maintainers ([[ClusterIndex]]) can extend the same exact merge
    * with their own derived tables and swap once atomically. */
  private[operators] def mergeBatch(
      spark: SparkSession, indexDir: String, batch: DataFrame): MergedBatch = {
    val corpusSh = spark.read.schema(ShSchema).parquet(s"$indexDir/text_shingles.parquet")
    val corpusTexts = spark.read.schema(TextsSchema).parquet(s"$indexDir/texts.parquet")
    val corpusDf = spark.read.schema(DfSchema).parquet(s"$indexDir/shingle_df.parquet")
    val members = spark.read.schema(MembersSchema).parquet(s"$indexDir/members.parquet")

    val (bshAll, btexts) = textShingles(batch)
    // batch texts that are NOT already resident: only these add shingle rows
    val newTkeys = btexts.select("tkey")
      .join(corpusTexts.select("tkey"), Seq("tkey"), "left_anti")
    val newSh = bshAll.join(newTkeys, "tkey")

    // copy-weighted df delta per batch shingle (ALL batch texts contribute —
    // resident ones add copies, hence df, too)
    val bdf = bshAll.join(btexts, "tkey")
      .groupBy(col("sh")).agg(sum(col("n_copies")).as("bdf"))
    val mergedDf = corpusDf.join(bdf, Seq("sh"), "full_outer")
      .select(col("sh"),
        (coalesce(col("cdf"), lit(0L)) + coalesce(col("bdf"), lit(0L))).as("cdf"))

    // shingles the batch pushed over the cap — batch-proportional by
    // construction (a subset of the batch's own shingles)
    val newlyOver = corpusDf.join(bdf, "sh")
      .filter(col("cdf") <= MaxShingleDf && col("cdf") + col("bdf") > MaxShingleDf)
      .select("sh")
    // resident-text n0 drop: one narrow scan of the shingle index against
    // the broadcast newly-over set
    val drops = corpusSh.join(broadcast(newlyOver), "sh")
      .groupBy(col("tkey")).agg(count(lit(1)).as("drop"))
    // batch-new texts count their shingles under the merged (final) df
    val newN0 = newSh
      .join(mergedDf.filter(col("cdf") > MaxShingleDf).select("sh"),
        Seq("sh"), "left_anti")
      .groupBy(col("tkey")).agg(count(lit(1)).as("bn0"))

    val mergedTexts = corpusTexts
      .join(btexts.withColumnRenamed("n_copies", "b_copies"), Seq("tkey"), "full_outer")
      .join(drops, Seq("tkey"), "left")
      .join(newN0, Seq("tkey"), "left")
      .select(col("tkey"),
        (coalesce(col("n_copies"), lit(0L)) + coalesce(col("b_copies"), lit(0L)))
          .as("n_copies"),
        coalesce(col("n0") - coalesce(col("drop"), lit(0L)), col("bn0"), lit(0L)).as("n0"))

    val mergedMembers = members.unionByName(
      batch.select(col("doc_id"), xxhash64(col("text")).as("tkey")))

    MergedBatch(corpusSh.unionByName(newSh), mergedDf, mergedTexts, mergedMembers,
      newTkeys, drops.select("tkey"))
  }

  /** Dedup `batch` against the index at `indexDir`. Returns
    * (old_id, new_id, jaccard) pairs with jaccard ≥ 0.5, where old docs are
    * the index members passing `oldFilter` and new docs are the batch.
    *
    * Plan shape (kept deliberately NARROW — at batch scale the cost is
    * exchange count, not rows): one shuffle agg for batch df, one for the
    * capped per-shingle batch-text lists (bounded ≤ cap — the lists are
    * collected AFTER the cap filter), ONE pass over the corpus shingle
    * index joined against the broadcast batch-shingle status (pair
    * candidates and cap corrections fall out of the same join), then
    * output-sized joins. Corpus text is never touched. */
  def run(
      spark: SparkSession,
      indexDir: String,
      batch: DataFrame,
      oldFilter: Column = bucketOf(col("doc_id")) < 80): DataFrame = {
    val corpusSh = spark.read.schema(ShSchema).parquet(s"$indexDir/text_shingles.parquet")
    val corpusTexts = spark.read.schema(TextsSchema).parquet(s"$indexDir/texts.parquet")
    val corpusDf = spark.read.schema(DfSchema).parquet(s"$indexDir/shingle_df.parquet")
    val olds = spark.read.schema(MembersSchema).parquet(s"$indexDir/members.parquet")
      .filter(oldFilter).withColumnRenamed("doc_id", "old_id")

    val (batchSh, batchTexts) = textShingles(batch)
    val news = batch.select(col("doc_id").as("new_id"), xxhash64(col("text")).as("tkey"))

    // effective df for batch shingles = corpus df + batch copy-weighted df;
    // non-batch shingles keep their stored status (batch only ADDS df)
    val status = batchSh.join(batchTexts, "tkey")
      .groupBy(col("sh")).agg(sum(col("n_copies")).as("bdf"))
      .join(corpusDf, Seq("sh"), "left")
      .select(col("sh"), coalesce(col("cdf"), lit(0L)).as("cdf"), col("bdf"))
      .withColumn("capped", col("cdf") + col("bdf") <= MaxShingleDf)
      // the batch pushed these over the cap: capped corpus-side, not now
      .withColumn("newly_over",
        col("cdf") <= MaxShingleDf && col("cdf") + col("bdf") > MaxShingleDf)

    // per capped shingle: the batch texts containing it. Collected AFTER
    // the cap, so each list is ≤ MaxShingleDf elements by construction.
    val btexts = batchSh
      .join(status.filter(col("capped")).select("sh"), "sh")
      .groupBy(col("sh")).agg(collect_list(col("tkey")).as("bts"))

    // ONE pass over the corpus shingle index: rows where a batch shingle
    // collides. The same join yields (a) cap corrections for corpus texts
    // and (b) corpus×batch pair candidates. `array_contains(bts, tkey)`
    // detects a text present on BOTH sides (same text ⇒ same shingle set),
    // so corpus×batch pairs exclude batch texts — those pairs come from
    // the batch-side list expansion below, exactly once each.
    val hits = corpusSh.join(
      broadcast(status.filter(col("capped") || col("newly_over"))
        .join(btexts, Seq("sh"), "left")
        .select(col("sh"), col("newly_over"), col("bts"))), "sh")
    val crossPairs = hits
      .filter(!col("newly_over") && !array_contains(col("bts"), col("tkey")))
      .select(col("tkey").as("ta"), explode(col("bts")).as("tb"))
      .select(least(col("ta"), col("tb")).as("t1"),
        greatest(col("ta"), col("tb")).as("t2"))
    // batch×batch pairs generated inline from the bounded lists (the
    // inverted-index trick from DedupOps) — disjoint from crossPairs
    val selfPairs = btexts
      .filter(size(col("bts")) >= 2)
      .select(explode(expr(
        "filter(flatten(transform(bts, x -> transform(bts, y -> named_struct('t1', x, 't2', y))))," +
          " p -> p.t1 < p.t2)")).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
    val inter = crossPairs.unionByName(selfPairs)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("inter"))

    // capped shingle count per text, batch df contribution folded in —
    // ONE aggregation over three row kinds (stage count is the cost at
    // batch scale, so corrections are not separate joins):
    //   corpus texts contribute their stored capped count n0,
    //   newly-over-cap hits contribute a -1 drop each,
    //   capped batch list elements contribute a +1 each.
    // A text on both sides yields corrected-corpus and batch counts that
    // are EQUAL by construction (same shingle set, same cap) — greatest()
    // merges them; batch-only texts have no n0 row (coalesce 0).
    val countRows = corpusTexts
      .select(col("tkey"), col("n0"), lit(0L).as("drop"), lit(0L).as("bn"))
      .unionByName(hits.filter(col("newly_over"))
        .select(col("tkey"), lit(null).cast("long").as("n0"),
          lit(1L).as("drop"), lit(0L).as("bn")))
      .unionByName(btexts.select(explode(col("bts")).as("tkey"))
        .select(col("tkey"), lit(null).cast("long").as("n0"),
          lit(0L).as("drop"), lit(1L).as("bn")))
    val counts = countRows.groupBy(col("tkey"))
      .agg(greatest(
        coalesce(max(col("n0")), lit(0L)) - sum(col("drop")),
        sum(col("bn"))).as("n"))
      .filter(col("n") >= 1)

    val simTexts = inter
      .join(counts.withColumnRenamed("tkey", "t1").withColumnRenamed("n", "n1"), "t1")
      .join(counts.withColumnRenamed("tkey", "t2").withColumnRenamed("n", "n2"), "t2")
      .select(col("t1"), col("t2"),
        (col("inter").cast(DoubleType)
          / (col("n1") + col("n2") - col("inter")).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= 0.5)

    // expansion to doc pairs — exactly q_dedup_incremental's output shape,
    // via ONE pair of joins: both cross orientations from a symmetric
    // explode, and the same-text 1.0 pairs ride along as synthetic
    // self-pairs (ta = tb) of every text with ≥1 capped shingle.
    val sym = simTexts.select(explode(array(
        struct(col("t1").as("ta"), col("t2").as("tb"), col("jaccard")),
        struct(col("t2").as("ta"), col("t1").as("tb"), col("jaccard")))).as("p"))
      .select(col("p.ta").as("ta"), col("p.tb").as("tb"), col("p.jaccard").as("jaccard"))
      .unionByName(counts.select(col("tkey").as("ta"), col("tkey").as("tb"),
        lit(1.0).as("jaccard")))
    sym
      .join(olds.withColumnRenamed("tkey", "ta"), "ta")
      .join(news.withColumnRenamed("tkey", "tb"), "tb")
      .select(col("old_id"), col("new_id"), col("jaccard"))
  }

  // --- q_dedup_incremental_indexed: the amortized-index query -------------
  // The index is built on first use and keyed by the documents parquet's
  // identity (path + size + mtime), so repeat runs — the real production
  // cadence, and bench pass 2 — pay only the batch-sized run phase.
  private def indexDirFor(dir: String): String = {
    // v3: index format version — bump when the index schema changes so a
    // stale on-disk index is never picked up
    val key = IndexStamp.dirKey(IndexStamp.identity(dir, "documents.parquet", "v3"))
    StoreRoot.dir(s"graft-corpus-index-$key")
  }

  private[operators] def indexedIncrementalOver(
      spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val indexDir = indexDirFor(dir)
    if (!StoreRoot.exists(spark, s"$indexDir/members.parquet"))
      buildIndex(docs.filter(bucketOf(col("doc_id")) < 90), indexDir)
    run(spark, indexDir, docs.filter(bucketOf(col("doc_id")) >= 90))
  }

  private def qIncrementalIndexed(spark: SparkSession, dir: String): DataFrame =
    indexedIncrementalOver(spark, dir)

  /** Prove the index-backed incremental pipeline ≡ the inline recompute
    * over the deterministic 1/8 sample universe — the
    * `q_dedup_incremental` certification lane's proof obligation
    * (round 16; see [[graft.operators.DedupOps]]). STAMPED variant
    * ([[SampledCert.certifyStamped]]): the batch×index machinery is
    * stage-deep even on 629 sample docs (~2.3 s measured at sf0.1 — more
    * than the inline lane the certificate replaced), so the per-serve
    * re-proof dispatches on the sample store's content identity: an
    * untouched store serves on the recorded digest proof with ZERO Spark
    * jobs; any store mutation forces the full digest re-proof. */
  private[operators] def certifySampledIncremental(
      spark: SparkSession, dir: String): Unit = {
    val sdir = CurationFunnel.ensureSampleCorpus(spark, dir)
    val sIdx = indexDirFor(sdir)
    // build the sample index FIRST so the stamp hashes the store the
    // indexed side actually serves from (not the pre-build absence)
    if (!StoreRoot.exists(spark, s"$sIdx/members.parquet"))
      buildIndex(Tables.table(spark, sdir, "documents")
        .filter(bucketOf(col("doc_id")) < 90), sIdx)
    SampledCert.certifyStamped(spark, sdir, "incremental", sIdx,
      indexedIncrementalOver(spark, sdir),
      DedupOps.inlineIncrementalOver(spark, sdir))
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_incremental_indexed", qIncrementalIndexed,
      Some(DedupOps.qDedupIncrementalSql)))
}
