package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection — Schleimer, Wilkerson, Aiken 2003
  * ("Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
  * algorithm). Where q_substring_dedup COUNTS every W-token window
  * corpus-wide, winnowing SAMPLES them with a locality guarantee: in
  * every window of `w` consecutive gram hashes, select the rightmost
  * minimal hash. Any substring match of length ≥ w + W − 1 tokens is
  * then guaranteed to share a selected fingerprint, at an expected
  * density of only 2/(w+1) of all grams — the index a 100 TB partial-dup
  * triage actually stores (MOSS and the CC-pipeline fingerprint stores
  * both rely on exactly this bound).
  *
  * Scale shape:
  *  - dedup-first: selection runs once per DISTINCT text (the DedupOps
  *    discipline); per-doc rows attach through the narrow (doc_id, tid)
  *    join, and the match lane shuffles only (8-byte gram hash, text
  *    representative) pairs;
  *  - selection itself is embarrassingly parallel per text (array HOFs
  *    inside whole-stage codegen — no shuffle at all until the match
  *    lane's wordcount-shaped hash agg);
  *  - the match lane df-caps hot fingerprints (a boilerplate gram shared
  *    by thousands of texts would square); cap 50 bounds any bucket's
  *    pair fanout at C(50,2).
  *
  * Determinism: single poly-hash family (token char fold base 31, gram
  * fold base 31 mod P — the SpanDedup gh1 family; one family suffices
  * here because a collision only perturbs which gram is sampled, and the
  * oracle replays the identical arithmetic). Ties in a window break to
  * the RIGHTMOST minimal gram via position arithmetic on the reversed
  * slice — identical in Spark `array_position` and DuckDB
  * `list_position` (both return the first 1-based match).
  */
object WinnowOps {
  import Tables.table

  /** Gram width in tokens (matches SpanDedup's W). */
  private val Wg = 8

  /** Winnow window: guarantee = any match ≥ Wg + WinW − 1 = 11 tokens
    * shares a fingerprint; expected density 2/(WinW+1) = 40%. */
  private val WinW = 4

  /** Match-lane document-frequency cap per fingerprint. */
  private val DfCap = 50

  /** Minimum shared fingerprints for a reported match pair. */
  private val MinShared = 2

  private val P = graft.functions.PolyMinHash.P

  private def charFold(t: Column, base: Int): Column =
    aggregate(transform(split(t, ""), c => ascii(c).cast(LongType)),
      lit(0L), (acc, c) => (acc * base + c) % P)

  private def gramFold(hs: Column, base: Int): Column =
    aggregate(hs, lit(0L), (acc, h) => (acc * base + h) % P)

  /** Per DISTINCT text: gram-hash array + winnowed selection.
    * Columns: tid, rep (min doc_id — the portable text identity the
    * match lane reports), m (gram count), ghs, sel (selected positions,
    * ascending-distinct). Texts shorter than Wg tokens are absent. */
  private[operators] def winnowed(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), " ")
    val withGh = docs
      .groupBy(col("text")).agg(min(col("doc_id")).as("rep"))
      .select(
        xxhash64(col("text")).as("tid"), col("rep"),
        transform(w, t => charFold(t, 31)).as("h1"),
        size(w).as("n_toks"))
      .filter(col("n_toks") >= Wg)
      .withColumn("m", (col("n_toks") - (Wg - 1)).cast(LongType))
      .withColumn("ghs",
        transform(sequence(lit(1), col("n_toks") - (Wg - 1)),
          j => gramFold(slice(col("h1"), j, lit(Wg)), 31)))
      .drop("h1", "n_toks")
    // rightmost-min selection per window of wl = min(WinW, m) grams
    val wl = least(lit(WinW), col("m")).cast(IntegerType)
    val nw = greatest(col("m") - (WinW - 1), lit(1L)).cast(IntegerType)
    withGh.withColumn("sel",
      array_distinct(transform(sequence(lit(1), nw), j => {
        val sl = slice(col("ghs"), j, wl)
        (j.cast(LongType) + wl.cast(LongType)
          - array_position(reverse(sl), array_min(sl)))
      })))
  }

  /** q_winnow: per-document selection stats — the whole selection
    * algorithm gated through the fingerprint-set and position-set sums. */
  private def qWinnow(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val perText = winnowed(docs).select(
      col("tid"),
      col("m").as("n_grams"),
      size(col("sel")).cast(LongType).as("n_fp"),
      aggregate(
        transform(col("sel"), p => element_at(col("ghs"), p.cast(IntegerType))),
        lit(0L), (a, x) => a + x).as("fp_digest"),
      aggregate(col("sel"), lit(0L), (a, x) => a + x).as("pos_digest"))
    docs.select(col("doc_id"), xxhash64(col("text")).as("tid"))
      .join(perText, Seq("tid"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("fp_digest"), lit(0L)).as("fp_digest"),
        coalesce(col("pos_digest"), lit(0L)).as("pos_digest"))
  }

  /** Per-text fingerprint rows (tid, rep, nfp, gh) — one row per
    * (distinct text, distinct selected gram hash). The inline match lane
    * consumes this directly; [[WinnowIndex]] persists exactly these rows
    * per epoch (rep min-merged, rows deduplicated at read). */
  private[operators] def fpRows(docs: DataFrame): DataFrame =
    winnowed(docs)
      .select(col("tid"), col("rep"),
        array_distinct(transform(col("sel"),
          p => element_at(col("ghs"), p.cast(IntegerType)))).as("fps"))
      .select(col("tid"), col("rep"),
        size(col("fps")).cast(LongType).as("nfp"),
        explode(col("fps")).as("gh"))

  /** MOSS-style match report from fingerprint rows: df-cap hot grams,
    * pair texts sharing ≥ MinShared fingerprints. Shared by the inline
    * and persisted-index lanes so both are the same algorithm by
    * construction. */
  private[operators] def matchesFrom(fps: DataFrame): DataFrame = {
    val dfok = fps.groupBy(col("gh")).agg(count(lit(1)).as("n_texts"))
      .filter(col("n_texts") <= DfCap)
      .select(col("gh"))
    val capped = fps.join(dfok, Seq("gh"))
    val a = capped.select(col("gh"), col("rep").as("doc_a"), col("nfp").as("na"))
    val b = capped.select(col("gh"), col("rep").as("doc_b"), col("nfp").as("nb"))
    a.join(b, Seq("gh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter(col("n_shared") >= MinShared)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        expr("(n_shared * 1000) div least(na, nb)").as("overlap_permille"))
  }

  /** q_winnow_matches: MOSS-style match report — text pairs sharing
    * ≥ MinShared selected fingerprints, overlap estimated from the
    * sampled sets only (never a full-text comparison). */
  private def qWinnowMatches(spark: SparkSession, dir: String): DataFrame =
    matchesFrom(fpRows(table(spark, dir, "documents")))

  // ---- oracles: naive formulations in DuckDB list comprehensions -------

  private def tokFold(base: Int) =
    s"list_transform(w, t -> list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(range(1, length(t)+1), j -> ascii(substring(t, j, 1))::BIGINT)), " +
      s"(acc, c) -> (acc * $base + c) % $P))"

  /** Shared winnowing chain from a (id, w token-list) relation named
    * `d`; yields `s(id, m, ghs, sel)`. */
  private def winnowSql(idCol: String): String =
    s"""h AS (SELECT $idCol, len(w) AS n_toks, ${tokFold(31)} AS h1 FROM d),
       |g AS (SELECT $idCol, CAST(n_toks - ${Wg - 1} AS BIGINT) AS m,
       |        [list_reduce(list_prepend(0::BIGINT, h1[j:j+${Wg - 1}]),
       |           (acc, x) -> (acc * 31 + x) % $P)
       |         FOR j IN range(1, n_toks - ${Wg - 2})] AS ghs
       |      FROM h WHERE n_toks >= $Wg),
       |s AS (SELECT $idCol, m, ghs,
       |        list_distinct([CAST(j + least($WinW, m)
       |            - list_position(list_reverse(ghs[j:j+least($WinW, m)-1]),
       |                list_min(ghs[j:j+least($WinW, m)-1])) AS BIGINT)
       |          FOR j IN range(1, greatest(m - ${WinW - 1}, 1) + 1)]) AS sel
       |      FROM g)""".stripMargin

  private val qWinnowSql =
    s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |${winnowSql("doc_id")},
       |a AS (SELECT doc_id, m, CAST(len(sel) AS BIGINT) AS n_fp,
       |        list_reduce(list_prepend(0::BIGINT,
       |          [ghs[CAST(p AS INT)] FOR p IN sel]), (a, b) -> a + b) AS fp_digest,
       |        list_reduce(list_prepend(0::BIGINT, sel), (a, b) -> a + b) AS pos_digest
       |      FROM s)
       |SELECT b.doc_id,
       |  COALESCE(a.m, 0)::BIGINT AS n_grams,
       |  COALESCE(a.n_fp, 0)::BIGINT AS n_fp,
       |  COALESCE(a.fp_digest, 0)::BIGINT AS fp_digest,
       |  COALESCE(a.pos_digest, 0)::BIGINT AS pos_digest
       |FROM (SELECT doc_id FROM documents) b LEFT JOIN a USING (doc_id)""".stripMargin

  private[operators] val qWinnowMatchesSql =
    s"""WITH d AS (SELECT MIN(doc_id) AS rep, string_split(trim(text), ' ') AS w
       |           FROM documents GROUP BY text),
       |${winnowSql("rep")},
       |f AS (SELECT rep, list_distinct([ghs[CAST(p AS INT)] FOR p IN sel]) AS fps
       |      FROM s),
       |e AS (SELECT rep, CAST(len(fps) AS BIGINT) AS nfp, unnest(fps) AS gh FROM f),
       |dfok AS (SELECT gh FROM e GROUP BY gh HAVING COUNT(*) <= $DfCap),
       |p AS (SELECT a.rep AS doc_a, b.rep AS doc_b, a.nfp AS na, b.nfp AS nb
       |      FROM e a JOIN e b USING (gh) JOIN dfok USING (gh)
       |      WHERE a.rep < b.rep)
       |SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared,
       |  (COUNT(*) * 1000) // least(ANY_VALUE(na), ANY_VALUE(nb)) AS overlap_permille
       |FROM p GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_winnow", qWinnow, Some(qWinnowSql)),
    QueryDef("q_winnow_matches", qWinnowMatches, Some(qWinnowMatchesSql)))
}
