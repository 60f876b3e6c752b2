package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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

  /** (signature table → family name); first match wins, so families
    * whose stores CONTAIN another family's signature table must come
    * first: cluster stores carry both `shingle_df.parquet` and
    * `edges.parquet` (and `labels.parquet`, unique to them) — keyed on
    * `labels.parquet` ahead of the shingle signature so they don't
    * misreport as incremental-dedup; IVF-PQ stores carry `codebook
    * .parquet` next to `centroids.parquet` (centroids first); sketch
    * stores carry `counts.parquet` next to `sample.parquet` (sample
    * first). THE single registry: [[report]] and
    * [[operators.Takedown.sweep]] both dispatch off it, so a family
    * added here is seen by the catalog AND the compliance sweep — the
    * two maps drifting apart is exactly the one-store-missed failure
    * the sweep exists to prevent. */
  val Families: Seq[(String, String)] = Seq(
    "centroids.parquet" -> "ivf",
    "codebook.parquet" -> "pq",
    "bands.parquet" -> "ann-lsh",
    "fps.parquet" -> "winnow",
    "grams.parquet" -> "span",
    "sample.parquet" -> "sketch",
    "pairs.parquet" -> "lm-bigram",
    "labels.parquet" -> "cluster",
    "edges.parquet" -> "cluster",
    "shingle_df.parquet" -> "incremental-dedup",
    "base.parquet" -> "pack",
    "postings.parquet" -> "search",
    "counts.parquet" -> "classifier",
    "merges.parquet" -> "tokenizer",
    "shingles.parquet" -> "eval-vocab",
    "buckets.parquet" -> "dsir")

  /** Family of a store given its table names — pure half of detection,
    * shared by [[report]] and the takedown sweep. */
  def detectFamily(tables: Seq[String]): String =
    Families.collectFirst {
      case (sig, fam) if tables.contains(sig) => fam
    }.getOrElse("unknown")

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
