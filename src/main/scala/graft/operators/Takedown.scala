package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One compliance takedown, fanned out across EVERY persisted store — the
  * operational face of the per-family deletion paths: a real deletion
  * request ("remove these documents") is a whole-pipeline property, and
  * asking the operator to remember fourteen `deleteFrom*` signatures is
  * how one store gets missed. [[sweep]] detects each store's family by
  * its table signature (the [[graft.IndexCatalog]] map), shapes the
  * victim rows to what that family's deletion needs (ids for doc-keyed
  * stores, full rows for the count models whose counters are not
  * doc-attributed, vec_id for the vector stores — doc_id ≡ vec_id by the
  * corpus contract), applies it, and reports per store.
  *
  * The tokenizer store is reported `retrain_required`, not deleted: its
  * model is a FROZEN corpus-global merge table — a document cannot be
  * un-trained from a BPE vocabulary, and pretending otherwise would be a
  * compliance hole. The family's existing two-rename retrain from the
  * remaining corpus is the documented path.
  *
  * Deletions are applied with each family's own semantics (immediate
  * read-path exclusion; durability at the next compact), so a sweep
  * followed by the maintenance loop's compacts leaves every store
  * bit-identical to one rebuilt without the victims — exactly what the
  * per-family delete specs pin. Single deletion writer, serialized with
  * maintenance ([[Tombstones.delete]] constraint).
  */
object Takedown {

  final case class StoreResult(dir: String, family: String, action: String)

  private def has(spark: SparkSession, dir: String, table: String): Boolean = {
    val p = new Path(dir, table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Apply one takedown batch to every store under `indexDirs`.
    * `docRows` carries the victim documents (doc_id required; text/lang/
    * source where the corpus has them — the count models need the rows
    * to reverse their arithmetic). Returns what happened per store. */
  def sweep(
      spark: SparkSession, docRows: DataFrame,
      indexDirs: Seq[String]): Seq[StoreResult] = {
    val ids = docRows.select(col("doc_id")).distinct()
    val vecIds = ids.select(col("doc_id").as("vec_id"))
    // a replayed request (at-least-once stream) or a never-resident id
    // must not append PHANTOM tombstone epochs: they would force a full
    // one-epoch compact of every table on every maintenance cycle for a
    // deletion that removes nothing (and keep tombstone-aware reads on
    // their slow paths). Filter to ids the store can still see: present
    // in its resident set (where the family keeps one) and not already
    // tombstoned. The count families do this internally (NegEpochs
    // victims); tombstone families get it here.
    def live(keyed: DataFrame, keyCol: String,
        resident: Option[DataFrame], dir: String): DataFrame = {
      val r = resident.fold(keyed)(res =>
        keyed.join(res.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi"))
      Tombstones.minus(spark, dir, r, keyCol)
    }
    def tombDelete(dir: String, keyed: DataFrame, keyCol: String,
        resident: Option[DataFrame]): String = {
      val fresh = live(keyed, keyCol, resident, dir).persist()
      try {
        if (fresh.isEmpty) "noop"
        else { Tombstones.delete(spark, dir, fresh, keyCol); "deleted" }
      } finally { fresh.unpersist(); () }
    }
    indexDirs.map { dir =>
      val family =
        if (has(spark, dir, "centroids.parquet")) "ivf"
        else if (has(spark, dir, "codebook.parquet")) "pq"
        else if (has(spark, dir, "bands.parquet")) "ann-lsh"
        else if (has(spark, dir, "merges.parquet")) "tokenizer"
        else if (has(spark, dir, "fps.parquet")) "winnow"
        else if (has(spark, dir, "grams.parquet")) "span"
        else if (has(spark, dir, "sample.parquet")) "sketch"
        else if (has(spark, dir, "pairs.parquet")) "lm-bigram"
        else if (has(spark, dir, "labels.parquet")) "cluster"
        else if (has(spark, dir, "shingle_df.parquet")) "incremental-dedup"
        else if (has(spark, dir, "base.parquet")) "pack"
        else if (has(spark, dir, "postings.parquet")) "search"
        else if (has(spark, dir, "counts.parquet")) "classifier"
        else if (has(spark, dir, "shingles.parquet")) "eval-vocab"
        else if (has(spark, dir, "buckets.parquet")) "dsir"
        else "unknown"
      def vecResident(table: String): Option[DataFrame] =
        if (has(spark, dir, table))
          Some(spark.read.parquet(s"$dir/$table").select(col("vec_id")))
        else None
      val action = family match {
        case "ivf" =>
          tombDelete(dir, vecIds, "vec_id", vecResident("cells.parquet"))
        case "pq" =>
          tombDelete(dir, vecIds, "vec_id", vecResident("ids.parquet"))
        case "ann-lsh" =>
          tombDelete(dir, vecIds, "vec_id", vecResident("vectors.parquet"))
        case "search" =>
          tombDelete(dir, ids, "doc_id",
            Some(SearchIndex.residentDocIds(spark, dir)))
        case "winnow" =>
          tombDelete(dir, ids, "doc_id",
            Some(WinnowIndex.residentDocIds(spark, dir)))
        case "pack" =>
          tombDelete(dir, ids, "doc_id",
            Some(PackIndex.residentDocIds(spark, dir)))
        case "eval-vocab" =>
          tombDelete(dir, ids, "doc_id",
            Some(EvalIndex.residentDocIds(spark, dir)))
        case "cluster" => ClusterIndex.deleteFromIndex(spark, dir, ids); "deleted"
        case "incremental-dedup" =>
          IncrementalDedup.deleteFromIndex(spark, dir, ids); "deleted"
        case "span" => SpanIndex.deleteFromIndex(spark, dir, docRows); "deleted"
        case "lm-bigram" => LmIndex.deleteFromModel(spark, dir, docRows); "deleted"
        case "classifier" =>
          ClassifyIndex.deleteFromModel(spark, dir, docRows); "deleted"
        case "dsir" => DsirIndex.deleteFromIndex(spark, dir, docRows); "deleted"
        case "sketch" => SketchIndex.deleteFromIndex(spark, dir, docRows); "deleted"
        case "tokenizer" => "retrain_required"
        case _ => "skipped_unknown"
      }
      StoreResult(dir, family, action)
    }
  }
}
