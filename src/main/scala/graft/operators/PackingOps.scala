package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the concat-and-chunk pack every LLM pretraining
  * loader performs between the curated corpus and the training batch
  * (GPT-2/3 convention; T5's "pack examples until the window is full"):
  * per source, documents in doc_id order form one token stream, the
  * stream is cut into fixed `WinTokens`-token training windows, and the
  * pack manifest records where every document landed. The two output
  * relations are the two artifacts a training stack actually consumes:
  *
  *  - `q_pack_chunks`: per document — its absolute token offset in the
  *    source stream and the [first_win, last_win] window span (a doc
  *    straddling a cut appears in both windows, the standard
  *    cross-document attention-mask case);
  *  - `q_pack_windows`: per training window — how many documents
  *    contribute and how many of its token slots each window actually
  *    fills (every window is exactly full except each source's last).
  *
  * Scale shape — the distributed prefix sum: the naive formulation is a
  * running SUM() window per source, which funnels every document of a
  * source through ONE task (a source at 100 TB is the whole-corpus
  * pathology). Here the scan is TWO-LEVEL: documents bucket by
  * `doc_id div Bucket`, each (source, bucket) computes its internal
  * running sum in parallel (thousands of independent window
  * partitions), bucket totals — a sources×buckets relation, tiny by
  * construction — get their running offsets in one bounded window, and
  * the absolute offset is `within-bucket cum + broadcast bucket offset`.
  * Integer addition reassociates, so the result is bit-identical to the
  * naive scan the DuckDB oracle runs.
  *
  * Determinism: pack order is (source, doc_id) — no timestamps, no
  * partition order dependence; token counts are the suite's standard
  * whitespace tokenization; all arithmetic is BIGINT (offsets, window
  * ids, fills), so both engines agree bit for bit.
  */
object PackingOps {
  import Tables.table

  /** Training window length in tokens. */
  private val WinTokens = 256L

  /** Documents per prefix-sum bucket (level-1 parallelism unit). */
  private val Bucket = 1024L

  /** (doc_id, source, n_toks, start_tok, end_tok) via the two-level
    * scan: end_tok is the running total through this doc in (source,
    * doc_id) order. Shared with the pack-at-ingest lane
    * ([[PackIndex]]), which adds each batch's scan onto the store's
    * resident per-source totals — prefix sums associate, so the
    * incremental manifest equals this one-shot scan for in-order
    * arrival. */
  private[operators] def offsets(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), " ")).cast(LongType).as("n_toks"),
      expr(s"doc_id div ${Bucket}L").as("bucket"))
    val w1 = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("cum_in", sum(col("n_toks")).over(w1))
    // level 2: per-source running offset of each bucket — the relation is
    // sources × occupied buckets (bounded: Bucket docs fold to one row)
    val w2 = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = d.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_toks")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(w2), lit(0L)))
      .select(col("source"), col("bucket"), col("boff"))
    within.join(broadcast(boff), Seq("source", "bucket"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("cum_in") + col("boff") - col("n_toks")).as("start_tok"),
        (col("cum_in") + col("boff")).as("end_tok"))
  }

  /** [[WinTokens]] for oracle builders that nest the pack arithmetic. */
  private[operators] def WinTokensVal: Long = WinTokens

  /** The q_pack_chunks shape over an arbitrary (doc_id, source, text)
    * frame — shared with the curated-pack composition
    * ([[CurationFunnel]]'s `q_pack_curated`). */
  private[operators] def chunksOver(docs: DataFrame): DataFrame =
    offsets(docs)
      .select(col("doc_id"), col("source"), col("n_toks"), col("start_tok"),
        expr(s"start_tok div ${WinTokens}L").as("first_win"),
        expr(s"(end_tok - 1) div ${WinTokens}L").as("last_win"))
      .withColumn("n_wins", col("last_win") - col("first_win") + 1L)

  private def qPackChunks(spark: SparkSession, dir: String): DataFrame =
    chunksOver(table(spark, dir, "documents"))

  /** The q_pack_windows shape over an arbitrary (doc_id, source, text)
    * frame — shared with the window-shuffle composition
    * ([[ShuffleOps]]'s `q_shuffle_windows`). */
  private[operators] def windowsOver(docs: DataFrame): DataFrame =
    offsets(docs)
      .select(col("source"), col("start_tok"), col("end_tok"),
        explode(sequence(
          expr(s"start_tok div ${WinTokens}L"),
          expr(s"(end_tok - 1) div ${WinTokens}L"))).as("win_id"))
      .groupBy(col("source"), col("win_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(
          least(col("end_tok"), (col("win_id") + 1L) * WinTokens)
            - greatest(col("start_tok"), col("win_id") * WinTokens))
          .as("n_tokens"))

  private def qPackWindows(spark: SparkSession, dir: String): DataFrame =
    windowsOver(table(spark, dir, "documents"))

  private val tokSql = "len(string_split(trim(text), ' '))::BIGINT"

  /** Naive single-window oracle — the engine's two-level scan must match
    * it by integer-addition reassociativity. */
  private def offsetsSql: String =
    s"""o AS (
       |  SELECT doc_id, source, $tokSql AS n_toks,
       |    SUM($tokSql) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tok
       |  FROM documents)""".stripMargin

  /** Shared with [[PackIndex]]'s serving lane (row-identical output). */
  private[operators] def qPackChunksOracle: String = qPackChunksSql

  private val qPackChunksSql =
    s"""WITH $offsetsSql
       |SELECT doc_id, source, n_toks,
       |  end_tok - n_toks AS start_tok,
       |  (end_tok - n_toks) // $WinTokens AS first_win,
       |  (end_tok - 1) // $WinTokens AS last_win,
       |  (end_tok - 1) // $WinTokens - (end_tok - n_toks) // $WinTokens + 1 AS n_wins
       |FROM o""".stripMargin

  /** Shared with [[ShuffleOps]]'s window-shuffle oracle (nested as a
    * derived table). */
  private[operators] def qPackWindowsOracle: String = qPackWindowsSql

  private val qPackWindowsSql =
    s"""WITH $offsetsSql,
       |x AS (
       |  SELECT source, end_tok - n_toks AS start_tok, end_tok,
       |    UNNEST(range((end_tok - n_toks) // $WinTokens,
       |                 (end_tok - 1) // $WinTokens + 1)) AS win_id
       |  FROM o)
       |SELECT source, win_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(LEAST(end_tok, (win_id + 1) * $WinTokens)
       |    - GREATEST(start_tok, win_id * $WinTokens)) AS BIGINT) AS n_tokens
       |FROM x GROUP BY 1, 2""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_pack_chunks", qPackChunks, Some(qPackChunksSql)),
    QueryDef("q_pack_windows", qPackWindows, Some(qPackWindowsSql)))
}
