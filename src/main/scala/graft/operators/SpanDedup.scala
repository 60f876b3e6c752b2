package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact duplicate-substring detection — the span-level dedup of Lee et
  * al. 2022 ("Deduplicating Training Data Makes Language Models Better"):
  * find every W-token window that occurs ≥2 times anywhere in the corpus
  * (across documents, across exact copies, or repeated within one
  * document), merge the overlapping hits per document into maximal
  * duplicated spans, and report per-document span counts / duplicated
  * token mass. This is finer-grained than the sibling block dedup
  * (DedupOps' line-granularity MassiveText rewrite): spans cross line
  * boundaries and catch partial-line template overlap.
  *
  * Scale shape (the suffix-array of the paper is replaced by the
  * hash-join formulation that distributes):
  *  - dedup-first: windows are enumerated once per DISTINCT text with
  *    copy weights (the DedupOps discipline) — 100× replicated data
  *    re-hashes the same distinct texts;
  *  - gram identity is a DOUBLE polynomial hash (independent 31/131 char
  *    folds composed with 31/37 window folds, both mod P) so the
  *    corpus-wide count shuffle carries 16 bytes per window, never token
  *    text, and a false duplicate needs a simultaneous collision in two
  *    independent 1e9-point families (~1/P² per pair);
  *  - the count agg is wordcount-shaped (map-side partial agg); the
  *    interval merge is windowed PER text-id — every window function
  *    here is partitioned, nothing funnels to a single reducer;
  *  - doc attribution is a hash join back on xxhash64(text), an internal
  *    join key that never reaches the output (so the engine-native hash
  *    is fine — output-affecting hashes use the portable poly family the
  *    DuckDB oracle replays exactly).
  *
  * Determinism: integer arithmetic end to end (fixed-point permille via
  * integer div); both engines fold left from 0 with identical moduli.
  */
object SpanDedup {
  import Tables.table

  /** Window width in tokens (Lee et al. use 50 BPE tokens at web scale;
    * 8 keeps spans observable on the short synthetic docs). */
  private val W = 8

  private val P = graft.functions.PolyMinHash.P

  /** Every W-token window of `docs`, once per DISTINCT text with copy
    * weights: (tid, n_copies, pos, gh1, gh2) — window hashes computed
    * per distinct text by the NATIVE single-pass expression
    * ([[graft.functions.PolyGramHashes]], bit-parity spec-pinned against
    * the composed HOF form the oracle replays), text dropped straight
    * after hashing so the gram identity shuffled downstream is 16 bytes. */
  private[operators] def grams(docs: DataFrame): DataFrame = {
    import graft.functions.PolyGramHashes.gramHashes
    docs.groupBy(col("text")).agg(count(lit(1)).as("n_copies"))
      .select(
        xxhash64(col("text")).as("tid"),
        col("n_copies"),
        gramHashes(col("text"), W, 31, 31).as("g1"),
        gramHashes(col("text"), W, 131, 37).as("g2"))
      .filter(col("g1").isNotNull)
      .select(col("tid"), col("n_copies"), posexplode(col("g1")), col("g2"))
      .select(col("tid"), col("n_copies"),
        (col("pos") + 1).as("pos"),
        col("col").as("gh1"),
        element_at(col("g2"), (col("pos") + 1).cast(IntegerType)).as("gh2"))
  }

  /** Corpus-wide occurrence weight per gram = Σ copies × in-text
    * occurrences — the ADDITIVE quantity [[SpanIndex]] persists. */
  private[operators] def gramCounts(docs: DataFrame): DataFrame =
    grams(docs).groupBy(col("gh1"), col("gh2"))
      .agg(sum(col("n_copies")).as("cnt"))

  /** Per-document span stats of `docs` against a duplicated-gram set
    * (gh1, gh2): interval-merge the hit windows per text, attribute back
    * to every doc_id. Every window function is partitioned by text-id. */
  private[operators] def spansAgainst(docs: DataFrame, dup: DataFrame): DataFrame = {
    val dupPos = grams(docs).join(dup, Seq("gh1", "gh2"))
      .select(col("tid"), col("pos"))
    // island starts where this window begins past the furthest end so far
    val wPrev = Window.partitionBy(col("tid")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("tid")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = dupPos
      .withColumn("ni",
        when(col("pos") > coalesce(max(col("pos") + (W - 1)).over(wPrev), lit(0)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("ni")).over(wRun))
      .groupBy(col("tid"), col("island"))
      .agg(min(col("pos")).as("st"), max(col("pos") + (W - 1)).as("en"))
    val perText = spans.groupBy(col("tid"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("en") - col("st") + 1).as("n_dup_tokens"))
    docs.select(col("doc_id"), xxhash64(col("text")).as("tid"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_toks"))
      .join(perText, Seq("tid"), "left")
      .withColumn("n_dup_spans", coalesce(col("n_dup_spans"), lit(0L)))
      .withColumn("n_dup_tokens", coalesce(col("n_dup_tokens"), lit(0L)))
      .select(col("doc_id"), col("n_toks"), col("n_dup_spans"), col("n_dup_tokens"),
        expr("(n_dup_tokens * 1000) div n_toks").as("dup_permille"))
  }

  private[operators] def qSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    spansAgainst(d,
      gramCounts(d).filter(col("cnt") >= 2).select(col("gh1"), col("gh2")))
  }

  // oracle: the NAIVE per-doc-row formulation (no dedup-first, no text-id
  // indirection) — per-row windows count copies implicitly, so the
  // weighted distinct-text plan above must agree exactly
  private[operators] val oracleSql: String = {
    def tokFold(base: Int) =
      s"list_transform(w, t -> list_reduce(list_prepend(0::BIGINT, " +
        s"list_transform(range(1, length(t)+1), j -> ascii(substring(t, j, 1))::BIGINT)), " +
        s"(acc, c) -> (acc * $base + c) % $P))"
    s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |h AS (SELECT doc_id, len(w) AS n_toks,
       |        ${tokFold(31)} AS h1, ${tokFold(131)} AS h2
       |      FROM d),
       |g AS (SELECT doc_id, i AS pos,
       |        list_reduce(list_prepend(0::BIGINT, h1[i:i+${W - 1}]),
       |          (acc, x) -> (acc * 31 + x) % $P) AS gh1,
       |        list_reduce(list_prepend(0::BIGINT, h2[i:i+${W - 1}]),
       |          (acc, x) -> (acc * 37 + x) % $P) AS gh2
       |      FROM h, UNNEST(range(1, n_toks - ${W - 2})) AS r(i)
       |      WHERE n_toks >= $W),
       |gc AS (SELECT gh1, gh2 FROM g GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM g JOIN gc USING (gh1, gh2)),
       |m AS (SELECT doc_id, pos,
       |        CASE WHEN pos > COALESCE(MAX(pos + ${W - 1}) OVER (
       |          PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        THEN 1 ELSE 0 END AS ni
       |      FROM dp),
       |isl AS (SELECT doc_id, pos, SUM(ni) OVER (
       |          PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |        FROM m),
       |s AS (SELECT doc_id, island, MIN(pos) AS st, MAX(pos + ${W - 1}) AS en
       |      FROM isl GROUP BY 1, 2),
       |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       |        CAST(SUM(en - st + 1) AS BIGINT) AS n_dup_tokens
       |      FROM s GROUP BY 1)
       |SELECT b.doc_id, b.n_toks,
       |  COALESCE(a.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       |  COALESCE(a.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
       |  (COALESCE(a.n_dup_tokens, 0) * 1000) // b.n_toks AS dup_permille
       |FROM (SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n_toks
       |      FROM documents) b
       |LEFT JOIN a USING (doc_id)""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_substring_dedup", qSubstringDedup, Some(oracleSql),
      headline = true))
}
