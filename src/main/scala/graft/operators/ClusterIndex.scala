package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Near-dup CLUSTERING against a persisted index — the third member of the
  * persisted-index family (IncrementalDedup: pair search; AnnIndex: vector
  * search; here: the cluster/canonical view a curation pipeline actually
  * consumes).
  *
  * q_dedup_clusters / q_dedup_canonical recompute the full text-pair graph
  * plus connected components on every run — the suite's two most expensive
  * queries, and at 100 TB a full-corpus re-shingle + re-cluster per batch.
  * The index amortizes both: alongside IncrementalDedup's four shingle
  * tables it persists
  *
  *  - edges.parquet:    (t1, t2) distinct text-level jaccard ≥ 0.5 pairs
  *                      (t1 < t2; intra-copy pairs stay analytic),
  *  - labels.parquet:   (tkey, label) connected-component labels for every
  *                      text with ≥ 1 edge (label = min member tkey),
  *  - doc_meta.parquet: (doc_id, n_chars) — what canonical selection needs,
  *                      so cluster AND canonical reads never touch text.
  *
  * The append is the interesting part. The df cap makes the edge set
  * NON-MONOTONE under appends: a batch can push a shingle over the cap,
  * which shrinks every containing text's capped shingle set — old×old
  * edges can appear (n drops → jaccard rises) or disappear (shared shingle
  * leaves the intersection), so components can MERGE and SPLIT. The
  * maintenance is still batch-proportional:
  *
  *   1. touched texts = batch texts ∪ texts containing a shingle the batch
  *      pushed over the cap (both batch-proportional —
  *      [[IncrementalDedup.mergeBatch]] computes them for its own n0
  *      correction);
  *   2. every edge with ≥ 1 touched endpoint is recomputed from the merged
  *      index (inverted-index generation seeded by the touched texts'
  *      capped shingles — cap-bounded lists, one narrow pass over the
  *      shingle index); an untouched-untouched pair cannot change (its
  *      shingle sets and every shared shingle's cap status are unchanged),
  *      so kept edges are exactly the old edges with both endpoints
  *      untouched;
  *   3. labels are re-derived only for AFFECTED components — those owning a
  *      touched text or an endpoint of any changed edge. Old edges respect
  *      old components, so the affected subgraph is edge-closed after one
  *      label join; [[DedupOps.connectedComponents]] runs on that subgraph
  *      (∝ affected cluster sizes, the honest lower bound — a merge or
  *      split of a cluster cannot relabel less than the cluster), and
  *      every other component keeps its labels verbatim.
  *
  * All seven tables are rewritten to a temp dir (reads of the live index
  * complete first) and swapped in with the two-rename pattern — readers
  * never observe a half-appended index. Spec-pinned: append produces
  * byte-identical tables to a full rebuild over the union, including
  * adversarial cap-crossing fixtures where a component must SPLIT and
  * where an edge must APPEAR.
  *
  * Reads are narrow long-column index scans joined output-side — cluster
  * membership, keeper choice, and canonical mapping all come from
  * (labels ⋈ members ⋈ texts [⋈ doc_meta]); corpus text is unreachable by
  * construction. `q_dedup_clusters_indexed` / `q_dedup_canonical_indexed`
  * ride the SAME DuckDB oracles as the inline operators, so build, append,
  * cap correction, subgraph re-clustering, and the read path are all
  * rows+schema+hash-gated.
  *
  * Reference behavior mirrored: idempotent re-run semantics of the loader
  * (reference main.py:153-168) — re-appending an already-folded batch is
  * the caller's to prevent, as with [[IncrementalDedup.appendToIndex]].
  */
object ClusterIndex {
  import DedupOps.MaxShingleDf
  import IncrementalDedup.bucketOf

  private val EdgesSchema = StructType(Seq(
    StructField("t1", LongType), StructField("t2", LongType)))
  private val LabelsSchema = StructType(Seq(
    StructField("tkey", LongType), StructField("label", LongType)))
  private val MetaSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_chars", LongType)))

  private def metaOf(docs: DataFrame): DataFrame = {
    val chars =
      if (docs.columns.contains("n_chars")) col("n_chars")
      else length(col("text"))
    docs.select(col("doc_id"), chars.cast(LongType).as("n_chars"))
  }

  /** jaccard ≥ 0.5 filter over (t1, t2, inter) using the index's exact
    * capped counts (texts.n0 ≡ the inline operator's per-text capped
    * shingle count). */
  private def jaccardEdges(inter: DataFrame, texts: DataFrame): DataFrame = {
    val n = texts.select(col("tkey"), col("n0"))
    inter
      .join(n.withColumnRenamed("tkey", "t1").withColumnRenamed("n0", "n1"), "t1")
      .join(n.withColumnRenamed("tkey", "t2").withColumnRenamed("n0", "n2"), "t2")
      .filter(col("inter").cast(DoubleType)
        / (col("n1") + col("n2") - col("inter")).cast(DoubleType) >= 0.5)
      .select(col("t1"), col("t2"))
  }

  private val inlinePairsExpr =
    "filter(flatten(transform(ts, x -> transform(ts, y -> named_struct('t1', x, 't2', y))))," +
      " p -> p.t1 < p.t2)"

  /** Full edge set from index-shaped inputs — build-time only (the per-
    * shingle lists span the whole corpus; at append time use
    * [[touchedEdges]], whose lists are batch-proportional). Same inverted-
    * index generation as DedupOps.ngramTextPairStats: lists are bounded by
    * the df cap BECAUSE stop-shingles are filtered first. */
  private def allEdges(sh: DataFrame, dfTab: DataFrame, texts: DataFrame): DataFrame = {
    val inter = sh
      // cap as an anti-join against the small HOT set (round 16 §2.3;
      // the DedupOps.ngramTextPairStats move)
      .join(dfTab.filter(col("cdf") > MaxShingleDf).select("sh"),
        Seq("sh"), "left_anti")
      .groupBy(col("sh")).agg(collect_list(col("tkey")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(inlinePairsExpr)).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("inter"))
    jaccardEdges(inter, texts)
  }

  /** Every edge with ≥ 1 endpoint in `touched`, recomputed exactly from
    * the merged index. One narrow pass over the shingle index against the
    * broadcast touched-text shingle lists (≤ MaxShingleDf entries each,
    * batch-proportional list count); touched×touched pairs come from the
    * in-list expansion exactly once, touched×untouched from the index
    * collision rows. */
  private def touchedEdges(
      sh: DataFrame, dfTab: DataFrame, texts: DataFrame,
      touched: DataFrame): DataFrame = {
    val lists = sh.join(touched, "tkey")
      .join(dfTab.filter(col("cdf") > MaxShingleDf).select("sh"),
        Seq("sh"), "left_anti")
      .groupBy(col("sh")).agg(collect_list(col("tkey")).as("ts"))
    val hits = sh.join(broadcast(lists), "sh")
    val cross = hits.filter(!array_contains(col("ts"), col("tkey")))
      .select(col("tkey").as("ta"), explode(col("ts")).as("tb"))
      .select(least(col("ta"), col("tb")).as("t1"),
        greatest(col("ta"), col("tb")).as("t2"))
    val self = lists.filter(size(col("ts")) >= 2)
      .select(explode(expr(inlinePairsExpr)).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
    val inter = cross.unionByName(self)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("inter"))
    jaccardEdges(inter, texts)
  }

  /** Build (overwrite) the cluster index: IncrementalDedup's four shingle
    * tables plus edges, labels, and doc metadata. */
  def buildIndex(resident: DataFrame, indexDir: String): Unit =
    StoreLock.withLock(resident.sparkSession, indexDir, "cluster-build") {
    IncrementalDedup.buildIndex(resident, indexDir) // reentrant, same store
    val spark = resident.sparkSession
    val (sh, dfTab, texts) = shingleTables(spark, indexDir)
    val edges = allEdges(sh, dfTab, texts)
    edges.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/edges.parquet")
    DedupOps.connectedComponents(
      edges.select(col("t1").as("d1"), col("t2").as("d2")))
      .select(col("id").as("tkey"), col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/labels.parquet")
    metaOf(resident).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/doc_meta.parquet")
  }

  private def shingleTables(
      spark: SparkSession, indexDir: String): (DataFrame, DataFrame, DataFrame) = (
    spark.read.schema(IncrementalDedup.ShSchema).parquet(s"$indexDir/text_shingles.parquet"),
    spark.read.schema(IncrementalDedup.DfSchema).parquet(s"$indexDir/shingle_df.parquet"),
    spark.read.schema(IncrementalDedup.TextsSchema).parquet(s"$indexDir/texts.parquet"))

  /** Fold a batch into the cluster index so it equals a full rebuild over
    * the union — without a corpus text scan (see object doc for the
    * edge/label maintenance argument). */
  def appendToIndex(spark: SparkSession, indexDir: String, batch: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "cluster-append") {
    val m = IncrementalDedup.mergeBatch(spark, indexDir, batch)
    val oldEdges = spark.read.schema(EdgesSchema).parquet(s"$indexDir/edges.parquet")
    val oldLabels = spark.read.schema(LabelsSchema).parquet(s"$indexDir/labels.parquet")
    val oldMeta = spark.read.schema(MetaSchema).parquet(s"$indexDir/doc_meta.parquet")

    val touched = m.newTkeys.unionByName(m.droppedTkeys).distinct().cache()
    val newEdges = touchedEdges(m.sh, m.df, m.texts, touched).cache()
    // untouched-untouched pairs cannot change — keep them verbatim
    val keptEdges = oldEdges
      .join(touched.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_anti")
      .join(touched.withColumnRenamed("tkey", "t2"), Seq("t2"), "left_anti")

    // components to re-derive: any owning a touched text or an endpoint of
    // a changed (recomputed or formerly-touching) edge
    val oldAffectedEdges = oldEdges
      .join(touched.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_semi")
      .unionByName(oldEdges
        .join(touched.withColumnRenamed("tkey", "t2"), Seq("t2"), "left_semi"))
    val changedTkeys = touched
      .unionByName(newEdges.select(col("t1").as("tkey")))
      .unionByName(newEdges.select(col("t2").as("tkey")))
      .unionByName(oldAffectedEdges.select(col("t1").as("tkey")))
      .unionByName(oldAffectedEdges.select(col("t2").as("tkey")))
      .distinct()
    val affected = oldLabels.join(changedTkeys, "tkey").select("label").distinct()
    val subNodes = oldLabels.join(affected, "label").select("tkey")
    // old edges respect old components, so semi-joining on t1 alone keeps
    // the subgraph edge-closed (t2 is in the same affected component)
    val subEdges = keptEdges
      .join(subNodes.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_semi")
      .unionByName(newEdges)
    val subLabels = DedupOps.connectedComponents(
      subEdges.select(col("t1").as("d1"), col("t2").as("d2")))
      .select(col("id").as("tkey"), col("label"))
    // a component's label is its min member tkey on both paths, so kept ∪
    // re-derived is exactly the rebuild's label table (spec-pinned).
    // Explicit column order on both: USING-style anti joins move the key
    // column first, and the spec compares tables to a rebuild positionally.
    val finalLabels = oldLabels.join(affected, Seq("label"), "left_anti")
      .unionByName(subLabels)
      .select(col("tkey"), col("label"))
    val finalEdges = keptEdges.unionByName(newEdges)
      .select(col("t1"), col("t2"))
    val finalMeta = oldMeta.unionByName(metaOf(batch))

    AtomicPublish.swapDir(spark, indexDir,
      tmpSuffix = ".append-tmp", bakSuffix = ".append-bak") { tmp =>
      m.sh.write.mode(SaveMode.Overwrite).parquet(s"$tmp/text_shingles.parquet")
      m.df.write.mode(SaveMode.Overwrite).parquet(s"$tmp/shingle_df.parquet")
      m.texts.write.mode(SaveMode.Overwrite).parquet(s"$tmp/texts.parquet")
      m.members.write.mode(SaveMode.Overwrite).parquet(s"$tmp/members.parquet")
      finalEdges.write.mode(SaveMode.Overwrite).parquet(s"$tmp/edges.parquet")
      finalLabels.write.mode(SaveMode.Overwrite).parquet(s"$tmp/labels.parquet")
      finalMeta.write.mode(SaveMode.Overwrite).parquet(s"$tmp/doc_meta.parquet")
      touched.unpersist()
      newEdges.unpersist()
      ()
    }
  }

  /** Takedown: remove `ids` so the index equals a full rebuild over
    * resident − ids — the append maintenance run in reverse, and the
    * verdict's "re-cluster affected components" case. The df cap makes
    * deletion non-monotone too: pulling a shingle back UNDER the cap
    * can create old×old edges (n rises… it joins intersections again)
    * or remove them (n grows → jaccard falls), so components can MERGE
    * and SPLIT; the affected-subgraph machinery is the same one the
    * append path spec-pinned. Victim-proportional plus narrow scans;
    * whole-dir swap; idempotent (a replayed takedown finds no members). */
  def deleteFromIndex(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "cluster-delete") {
    val m = IncrementalDedup.mergeDelete(spark, indexDir, ids)
    if (m.members eq null) return
    val oldEdges = spark.read.schema(EdgesSchema).parquet(s"$indexDir/edges.parquet")
    val oldLabels = spark.read.schema(LabelsSchema).parquet(s"$indexDir/labels.parquet")
    val oldMeta = spark.read.schema(MetaSchema).parquet(s"$indexDir/doc_meta.parquet")

    val touched = m.droppedTkeys.unionByName(m.raisedTkeys).distinct().cache()
    val newEdges = touchedEdges(m.sh, m.df, m.texts, touched).cache()
    val keptEdges = oldEdges
      .join(touched.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_anti")
      .join(touched.withColumnRenamed("tkey", "t2"), Seq("t2"), "left_anti")

    val oldAffectedEdges = oldEdges
      .join(touched.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_semi")
      .unionByName(oldEdges
        .join(touched.withColumnRenamed("tkey", "t2"), Seq("t2"), "left_semi"))
    val changedTkeys = touched
      .unionByName(newEdges.select(col("t1").as("tkey")))
      .unionByName(newEdges.select(col("t2").as("tkey")))
      .unionByName(oldAffectedEdges.select(col("t1").as("tkey")))
      .unionByName(oldAffectedEdges.select(col("t2").as("tkey")))
      .distinct()
    val affected = oldLabels.join(changedTkeys, "tkey").select("label").distinct()
    val subNodes = oldLabels.join(affected, "label").select("tkey")
    val subEdges = keptEdges
      .join(subNodes.withColumnRenamed("tkey", "t1"), Seq("t1"), "left_semi")
      .unionByName(newEdges)
    val subLabels = DedupOps.connectedComponents(
      subEdges.select(col("t1").as("d1"), col("t2").as("d2")))
      .select(col("id").as("tkey"), col("label"))
    val finalLabels = oldLabels.join(affected, Seq("label"), "left_anti")
      .unionByName(subLabels)
      .select(col("tkey"), col("label"))
    val finalEdges = keptEdges.unionByName(newEdges)
      .select(col("t1"), col("t2"))
    val finalMeta = oldMeta.join(
      ids.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")

    AtomicPublish.swapDir(spark, indexDir,
      tmpSuffix = ".delete-tmp", bakSuffix = ".delete-bak") { tmp =>
      m.sh.write.mode(SaveMode.Overwrite).parquet(s"$tmp/text_shingles.parquet")
      m.df.write.mode(SaveMode.Overwrite).parquet(s"$tmp/shingle_df.parquet")
      m.texts.write.mode(SaveMode.Overwrite).parquet(s"$tmp/texts.parquet")
      m.members.write.mode(SaveMode.Overwrite).parquet(s"$tmp/members.parquet")
      finalEdges.write.mode(SaveMode.Overwrite).parquet(s"$tmp/edges.parquet")
      finalLabels.write.mode(SaveMode.Overwrite).parquet(s"$tmp/labels.parquet")
      finalMeta.write.mode(SaveMode.Overwrite).parquet(s"$tmp/doc_meta.parquet")
      touched.unpersist()
      newEdges.unpersist()
      ()
    }
  }

  /** q_dedup_clusters from index tables only (labels ⋈ members ⋈ texts):
    * edge components expand to member docs; texts with ≥ 2 copies, ≥ 1
    * capped shingle, and no edge form their own intra-copy component —
    * the inline operator's exact output shape. */
  def clustersFromIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val labels = spark.read.schema(LabelsSchema).parquet(s"$indexDir/labels.parquet")
    val texts = spark.read.schema(IncrementalDedup.TextsSchema)
      .parquet(s"$indexDir/texts.parquet")
    val members = spark.read.schema(IncrementalDedup.MembersSchema)
      .parquet(s"$indexDir/members.parquet")
    val reps = members.groupBy(col("tkey")).agg(min(col("doc_id")).as("rep"))
    val intraOnly = texts
      .filter(col("n_copies") >= 2 && col("n0") >= 1)
      .join(labels, Seq("tkey"), "left_anti")
      .select(col("tkey"), col("tkey").as("label"))
    val allComp = labels.unionByName(intraOnly)
    val clusterIds = allComp.join(reps, "tkey")
      .groupBy(col("label")).agg(min(col("rep")).as("cluster_id"))
    allComp.join(clusterIds, "label")
      .join(members, "tkey")
      .select(col("doc_id"), col("cluster_id"),
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L).as("is_keeper"))
  }

  /** q_dedup_canonical from index tables only — cluster labels above plus
    * the persisted (doc_id, n_chars) metadata for the quality-greedy
    * representative window. */
  def canonicalFromIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val clusters = clustersFromIndex(spark, indexDir)
      .select(col("doc_id"), col("cluster_id"))
    val meta = spark.read.schema(MetaSchema).parquet(s"$indexDir/doc_meta.parquet")
    val labeled = meta
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val canon = labeled.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("canonical_id"))
    labeled.join(canon, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L).as("is_canonical"))
  }

  // --- gate queries: amortized-index twins of clusters/canonical ---------
  // Index built lazily per corpus identity: resident = bucket < 90, then
  // the ≥ 90 batch FOLDED IN VIA APPEND — so the maintenance path (cap
  // corrections, edge recompute, subgraph re-clustering) sits inside the
  // oracle-checked output, not just specs. Repeat runs (bench pass 2) pay
  // only the index-read query.
  private def indexDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(IndexStamp.identity(dir, "documents.parquet", "cluster-v1"))
    StoreRoot.dir(s"graft-cluster-index-$key")
  }

  private[operators] def ensureIndex(spark: SparkSession, dir: String): String = {
    val indexDir = indexDirFor(dir)
    if (!StoreRoot.exists(spark, s"$indexDir/labels.parquet")) {
      // build + append into a staging dir, publish with one atomic rename —
      // a crash between build and append can never leave a half-initialized
      // index where the existence check would trust it
      val staging = indexDir + ".build"
      val fs = new Path(staging).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(staging), true)
      val docs = Tables.table(spark, dir, "documents")
      buildIndex(docs.filter(bucketOf(col("doc_id")) < 90), staging)
      appendToIndex(spark, staging, docs.filter(bucketOf(col("doc_id")) >= 90))
      if (!fs.rename(new Path(staging), new Path(indexDir)))
        throw new java.io.IOException(s"cluster index publish failed: $staging -> $indexDir")
    }
    indexDir
  }

  // --- the sampled inline≡indexed certificates (the q_curation2 move) ---
  // Digest protocol and record layout live in [[SampledCert]] (round-16:
  // the v1 canonical certificate collect()ed the full N/8 sample output to
  // the driver per serve — the suite's one corpus-proportional driver
  // materialization; v2 compares one order-insensitive digest row per
  // side and the record is 4 fixed lines).

  /** Prove canonical inline≡indexed over the deterministic 1/8 sample
    * universe ([[CurationFunnel.ensureSampleCorpus]] — the same sample
    * corpus the funnel certificate rides, so one sample store serves
    * both). The inline side (full pair graph + CC) is a pure function of
    * the immutable sample corpus — computed once per universe and
    * RECORDED; the indexed side (build + fold-in append + store reads —
    * the part that can actually drift) is re-served and digest-compared
    * on EVERY invocation. */
  private[operators] def certifySampledCanonical(
      spark: SparkSession, dir: String): Unit = {
    val sdir = CurationFunnel.ensureSampleCorpus(spark, dir)
    SampledCert.certify(spark, sdir, "canonical",
      canonicalFromIndex(spark, ensureIndex(spark, sdir)),
      DedupOps.inlineCanonicalOver(spark, sdir))
  }

  /** Same proof for the cluster map (labels ⋈ members ⋈ min-rep): the
    * round-15 verdict's task 5 — `q_dedup_clusters` moves from a
    * per-run full-corpus inline ablation to certified store serving. */
  private[operators] def certifySampledClusters(
      spark: SparkSession, dir: String): Unit = {
    val sdir = CurationFunnel.ensureSampleCorpus(spark, dir)
    SampledCert.certify(spark, sdir, "clusters",
      clustersFromIndex(spark, ensureIndex(spark, sdir)),
      DedupOps.inlineClustersOver(spark, sdir))
  }

  private def qClustersIndexed(spark: SparkSession, dir: String): DataFrame =
    clustersFromIndex(spark, ensureIndex(spark, dir))

  private def qCanonicalIndexed(spark: SparkSession, dir: String): DataFrame =
    canonicalFromIndex(spark, ensureIndex(spark, dir))

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_clusters_indexed", qClustersIndexed,
      Some(DedupOps.qDedupClustersSql)),
    QueryDef("q_dedup_canonical_indexed", qCanonicalIndexed,
      Some(DedupOps.qDedupCanonicalSql)))
}
