package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine surface: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet tables.
  *
  * Contract notes (driver correctness gate, see builder prompt):
  *  - output column names must match the oracle exactly (driver sorts columns
  *    by name before hashing);
  *  - aggregates over doubles must go through exact decimal arithmetic in
  *    BOTH engines, because double summation order differs between Spark
  *    partial aggregation and DuckDB — see operators/Relational.scala;
  *  - `oracle = None` → driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in Bench headline timing */
    headline: Boolean = false)

object QueryRegistry {
  def all: Seq[QueryDef] =
    operators.Relational.queries ++
      operators.AdvancedOps.queries ++
      operators.FunctionQueries.queries ++
      operators.TextOps.queries ++
      operators.CurationFunnel.queries ++
      operators.GopherRules.queries ++
      operators.PackingOps.queries ++
      operators.PackIndex.queries ++
      operators.ShuffleOps.queries ++
      operators.CorpusOps.queries ++
      operators.DedupOps.queries ++
      operators.SpanDedup.queries ++
      operators.WinnowOps.queries ++
      operators.WinnowIndex.queries ++
      operators.QuantileSketch.queries ++
      operators.SketchIndex.queries ++
      operators.RangeJoinOps.queries ++
      operators.SpanIndex.queries ++
      operators.ClassifyOps.queries ++
      operators.ClassifyIndex.queries ++
      operators.IncrementalDedup.queries ++
      operators.ClusterIndex.queries ++
      operators.SimilarityOps.queries ++
      operators.AnnIndex.queries ++
      operators.PqIndex.queries ++
      operators.IvfIndex.queries ++
      operators.IvfPq.queries ++
      operators.LmIndex.queries ++
      operators.SelectOps.queries ++
      operators.RetrievalOps.queries ++
      operators.SearchIndex.queries ++
      operators.EvalIndex.queries ++
      operators.TokenizerIndex.queries ++
      operators.DsirIndex.queries ++
      operators.HeavyHitters.queries ++
      operators.CorpusDiff.queries ++
      operators.LabelOps.queries ++
      operators.EvalOps.queries ++
      operators.EventOps.queries ++
      operators.MultimodalOps.queries ++
      operators.ProfileOps.queries ++
      ingest.TypeInference.queries

  /** The 5 permanent rows-only lanes (no DuckDB oracle — their output
    * hashes engine-specific xxhash64/sign geometry) → the hash-gated
    * `_portable` twin that certifies each (same algorithm re-based on
    * portable arithmetic). ONE copy, consumed by both the bench record
    * and the verify-dump lane notes — two hand-kept lists would drift. */
  val certifiedByTwin: Seq[(String, String)] = Seq(
    "q_ann_lsh" -> "q_ann_lsh_portable",
    "q_ann_recall" -> "q_ann_recall_portable",
    "q_dedup_minhash" -> "q_dedup_minhash_portable",
    "q_dedup_minhash_verified" -> "q_dedup_minhash_portable",
    "q_dedup_simhash" -> "q_dedup_simhash_portable")

  lazy val byName: Map[String, QueryDef] = {
    val qs = all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    qs.map(q => q.name -> q).toMap
  }
}
