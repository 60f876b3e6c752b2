package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operator-facing inspection of persisted index stores — the catalog
  * half of the round-8 policy layer ([[operators.IndexPolicy]]). Given
  * one or more index directories, detects the family by its table
  * signature, and prints per table: published epoch count, row count,
  * and any crash-recovery residue (`.compact-bak` / dot-staging dirs);
  * IVF stores additionally get their [[operators.IvfIndex.driftReport]].
  * Run:
  *
  *   sbt "runMain graft.IndexCatalog /tmp/graft-ivf-index-* ..."
  */
object IndexCatalog {

  /** How a family's DELETION runs — the discipline tag the compliance
    * sweep ([[operators.Takedown.sweep]]) dispatches off, carried IN the
    * registry row so a new family cannot be registered without its
    * deletion semantics (the r12 verdict's one-registry argument, now
    * covering detection AND dispatch: before this, the sweep's
    * count-family set and per-family match arms were hand-maintained
    * beside the registry, and a 17th family missing from either would
    * only fail mid-sweep). */
  sealed trait Discipline
  object Discipline {
    /** Vector-keyed tombstone store: deletes by `vec_id` alone;
      * `residentTable` carries the store's resident vec_id set (the
      * replay-idempotence filter reads it when present). */
    final case class TombstoneVec(residentTable: String) extends Discipline
    /** Doc-keyed tombstone store: deletes by `doc_id` alone; `resident`
      * reads the store's resident-doc ledger. */
    final case class TombstoneDoc(
        resident: (SparkSession, String) => DataFrame) extends Discipline
    /** Doc-keyed store whose delete IS an atomic whole-store rewrite —
      * no pending state afterwards, nothing for a compact to apply. */
    final case class Rewrite(
        delete: (SparkSession, String, DataFrame) => Unit) extends Discipline
    /** Count model: state is not doc-keyed, so the additive arithmetic
      * runs in reverse — `delete` needs the victims' FULL rows
      * (text/lang/source), and `resident` serves the unresolved-hole
      * report (an id the store holds but the corpus can't resolve). */
    final case class Count(
        delete: (SparkSession, String, DataFrame) => Unit,
        resident: (SparkSession, String) => DataFrame) extends Discipline
    /** Frozen corpus-global model (BPE merge table): a document cannot
      * be un-trained from it — the sweep reports `retrain_required`. */
    case object Retrain extends Discipline
  }

  /** One registry row: (signature table, family name, deletion
    * discipline, deletion-applying compact, serving-surface minimum).
    * `compact` retires the family's pending deletion state (tombstones /
    * neg-epoch ledger) — None exactly when deletion leaves no pending
    * state ([[Discipline.Rewrite]]/[[Discipline.Retrain]]); the sweep's
    * `applyNow` mode and [[operators.IndexFsck.repair]] both run it.
    * `requiredTables` is what a store of the family cannot SERVE without
    * (not every table it may write — optional artifacts like the IVF
    * drift baseline get softer checks); [[operators.IndexFsck]]'s
    * missing-table check reads it, so fsck coverage of a new family
    * arrives with its registration, not with a second hand-kept map. */
  final case class FamilyDef(
      signature: String, name: String, discipline: Discipline,
      compact: Option[(SparkSession, String) => Unit],
      requiredTables: Seq[String])

  /** First match wins, so families whose stores CONTAIN another family's
    * signature table must come first: cluster stores carry both
    * `shingle_df.parquet` and `edges.parquet` (and `labels.parquet`,
    * unique to them) — keyed on `labels.parquet` ahead of the shingle
    * signature so they don't misreport as incremental-dedup; IVF-PQ
    * stores carry `codebook.parquet` next to `centroids.parquet`
    * (centroids first); sketch stores carry `counts.parquet` next to
    * `sample.parquet` (sample first). THE single registry: [[report]]
    * and [[operators.Takedown.sweep]] both dispatch off it — detection
    * AND deletion discipline AND the deletion-applying compact — so a
    * family added here is seen by the catalog, the compliance sweep, and
    * the retirement paths in one row; two maps drifting apart is exactly
    * the one-store-missed failure the sweep exists to prevent. */
  val Families: Seq[FamilyDef] = {
    import Discipline._
    import operators._
    Seq(
      FamilyDef("centroids.parquet", "ivf",
        TombstoneVec("cells.parquet"), Some(IvfIndex.compact),
        Seq("centroids.parquet", "cells.parquet")),
      FamilyDef("codebook.parquet", "pq",
        TombstoneVec("ids.parquet"), Some(PqIndex.compact),
        Seq("codebook.parquet", "codes.parquet", "ids.parquet", "vecs.parquet")),
      FamilyDef("bands.parquet", "ann-lsh",
        TombstoneVec("vectors.parquet"), Some(AnnIndex.compact),
        Seq("bands.parquet", "vectors.parquet")),
      FamilyDef("fps.parquet", "winnow",
        TombstoneDoc(WinnowIndex.residentDocIds), Some(WinnowIndex.compact),
        Seq("fps.parquet", "members.parquet", "docs.parquet")),
      FamilyDef("grams.parquet", "span",
        Count(SpanIndex.deleteFromIndex, SpanIndex.residentDocIds),
        Some(SpanIndex.compact),
        Seq("grams.parquet", "docs.parquet")),
      FamilyDef("sample.parquet", "sketch",
        Count(SketchIndex.deleteFromIndex, SketchIndex.residentDocIds),
        Some(SketchIndex.compact),
        Seq("sample.parquet", "counts.parquet", "docs.parquet")),
      FamilyDef("pairs.parquet", "lm-bigram",
        Count(LmIndex.deleteFromModel, LmIndex.residentDocIds),
        Some(LmIndex.compact),
        Seq("pairs.parquet", "docs.parquet")),
      FamilyDef("labels.parquet", "cluster",
        Rewrite(ClusterIndex.deleteFromIndex), None,
        Seq("labels.parquet", "members.parquet", "shingle_df.parquet", "texts.parquet", "text_shingles.parquet")),
      FamilyDef("edges.parquet", "cluster",
        Rewrite(ClusterIndex.deleteFromIndex), None,
        Seq("labels.parquet", "members.parquet", "shingle_df.parquet", "texts.parquet", "text_shingles.parquet")),
      FamilyDef("shingle_df.parquet", "incremental-dedup",
        Rewrite(IncrementalDedup.deleteFromIndex), None,
        Seq("members.parquet", "shingle_df.parquet", "texts.parquet", "text_shingles.parquet")),
      FamilyDef("base.parquet", "pack",
        TombstoneDoc(PackIndex.residentDocIds), Some(PackIndex.compact),
        Seq("base.parquet", "docs.parquet")),
      FamilyDef("postings.parquet", "search",
        TombstoneDoc(SearchIndex.residentDocIds), Some(SearchIndex.compact),
        Seq("postings.parquet", "docs.parquet")),
      FamilyDef("counts.parquet", "classifier",
        Count(ClassifyIndex.deleteFromModel, ClassifyIndex.residentDocIds),
        Some(ClassifyIndex.compact),
        Seq("counts.parquet", "docs.parquet")),
      FamilyDef("merges.parquet", "tokenizer", Retrain, None,
        Seq("merges.parquet")),
      FamilyDef("shingles.parquet", "eval-vocab",
        TombstoneDoc(EvalIndex.residentDocIds), Some(EvalIndex.compact),
        Seq("shingles.parquet", "docs.parquet")),
      FamilyDef("buckets.parquet", "dsir",
        Count(DsirIndex.deleteFromIndex, DsirIndex.residentDocIds),
        Some(DsirIndex.compact),
        Seq("buckets.parquet", "docs.parquet")),
      FamilyDef(PseudoLabelStore.Table, "pseudo-labels",
        Rewrite(PseudoLabelStore.deleteFromStore), None,
        Seq(PseudoLabelStore.Table)),
      // NB: IVF stores also carry a baseline.parquet (assignment
      // tightness) — they detect as `ivf` first via centroids.parquet
      // (first match wins); a store whose ONLY table is baseline.parquet
      // is the drift monitor's share census. The census stores per-mille
      // shares, not counts, so one document's contribution cannot be
      // reversed out of it — like the BPE merge table, deletion is an
      // honest `retrain_required`: re-baseline from the post-deletion
      // corpus (DriftMonitor.writeBaseline overwrites atomically).
      FamilyDef("baseline.parquet", "drift-baseline", Retrain, None,
        Seq("baseline.parquet")))
  }

  /** Family row of a store given its table names — pure half of
    * detection, shared by [[report]] and the takedown sweep. */
  def detectFamilyDef(tables: Seq[String]): Option[FamilyDef] =
    Families.find(f => tables.contains(f.signature))

  /** Family row of the store at `dir` (one directory listing;
    * dot-staging and bak residue excluded, as in [[report]]). None —
    * including for a missing/empty dir — means the sweep must report the
    * store rather than crash on it. */
  def detectFamilyDef(spark: SparkSession, dir: String): Option[FamilyDef] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else detectFamilyDef(fs.listStatus(root).map(_.getPath.getName).toSeq
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".")))
  }

  /** Family of a store given its table names. */
  def detectFamily(tables: Seq[String]): String =
    detectFamilyDef(tables).fold("unknown")(_.name)

  /** Family of the store at `dir` (one directory listing; dot-staging
    * and bak residue excluded, as in [[report]]). A missing or empty
    * dir is `unknown` — the sweep reports it rather than crashing. */
  def detectFamily(spark: SparkSession, dir: String): String = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) "unknown"
    else detectFamily(fs.listStatus(root).map(_.getPath.getName).toSeq
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".")))
  }

  final case class TableReport(
      name: String, epochs: Int, rows: Long, residue: Seq[String]) {
    /** Compaction debt: published epochs a compact() would fold away.
      * Every family's compact folds a table to ONE epoch, so debt =
      * epochs − 1 — the read-amplification the policy layer bounds
      * ([[operators.IndexPolicy.CompactEvery]]); a table at 0 debt is
      * freshly compacted (or unpartitioned). */
    def compactionDebt: Int = math.max(0, epochs - 1)
  }

  final case class IndexReport(
      dir: String, family: String, tables: Seq[TableReport],
      drift: Option[operators.IvfIndex.DriftReport],
      /** Keys awaiting the deletion-applying compact: tombstoned ids
        * ([[operators.Tombstones]] families) or the negative-epoch
        * deletion ledger ([[operators.NegEpochs]] count families). None
        * when the store has no pending deletions — every family now has
        * one of the two takedown paths. */
      pendingDeletes: Option[Long] = None)

  /** Structured report for one index dir (spec-callable). */
  def report(spark: SparkSession, dir: String): IndexReport = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(root).map(_.getPath.getName).toSeq.sorted
    val tables = children.filter(n => n.endsWith(".parquet") && !n.startsWith("."))
    val family = detectFamily(tables)
    val reports = tables.map { t =>
      val tp = new Path(root, t)
      val sub = fs.listStatus(tp).map(_.getPath.getName).toSeq
      val epochs = sub.count(_.startsWith("epoch="))
      val rows =
        try spark.read.parquet(tp.toString).count()
        catch { case _: Throwable => -1L }
      TableReport(t, epochs, rows, sub.filter(_.startsWith(".")))
    }
    val residue = children.filter(n => n.contains(".compact-bak") || n.startsWith("."))
    val drift =
      if (family == "ivf" && tables.contains("baseline.parquet"))
        try Some(operators.IvfIndex.driftReport(spark, dir))
        catch { case _: Throwable => None }
      else None
    // pending deletions, whichever discipline the family uses: the
    // tombstone table (doc/vector-keyed stores) or the NegEpochs dels
    // ledger (count models) — both retire at the next compact
    val pendingDeletes = Seq("tombstones.parquet", "dels.parquet")
      .filter(tables.contains)
      .map(t => try {
        // count distinct KEYS, not rows: the same key tombstoned in two
        // epochs (a replay before the compact) is ONE pending deletion,
        // and the epoch partition column must not split it
        val df = spark.read.parquet(new Path(root, t).toString)
        df.select(df.columns.filterNot(_ == "epoch").map(c =>
          org.apache.spark.sql.functions.col(c)): _*)
          .dropDuplicates().count()
      } catch { case _: Throwable => 0L })
      .reduceOption(_ + _).filter(_ > 0)
    IndexReport(dir, family,
      reports ++ residue.map(r => TableReport(r, 0, -1L, Seq(r))), drift,
      pendingDeletes)
  }

  /** Render one report as the CLI's output lines. */
  def render(r: IndexReport): Seq[String] = {
    val head = s"[catalog] ${r.dir} family=${r.family}"
    val tabs = r.tables.map { t =>
      val ep =
        if (t.epochs > 0) s"epochs=${t.epochs} debt=${t.compactionDebt}"
        else "unpartitioned"
      val res = if (t.residue.nonEmpty) s" RESIDUE=${t.residue.mkString(",")}" else ""
      f"[catalog]   ${t.name}%-22s $ep%-16s rows=${t.rows}$res"
    }
    val drift = r.drift.map { d =>
      f"[catalog]   drift: baseline=${d.baselineMean}%.4f appended=${d.appendedMean}%.4f " +
        s"rows=${d.appendedRows} retrain=${d.retrain}"
    }
    val dels = r.pendingDeletes.map(n =>
      s"[catalog]   PENDING DELETES: $n key(s) — next compact applies them")
    (head +: tabs) ++ drift ++ dels
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IndexCatalog <indexDir> [indexDir...]")
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args.foreach { dir =>
      render(report(spark, dir)).foreach(println)
    } finally spark.stop()
  }
}
