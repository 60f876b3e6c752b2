package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level analytics — the cross-document half of the LLM-pipeline
  * surface (per-document signals live in [[TextOps]]): sequence packing for
  * training-batch construction, a BPE merge-step (corpus-wide adjacent-pair
  * argmax), fixed-point inverted-index keyword search, per-document rarity
  * scoring, source-pair Jaccard overlap, a KMV distinct-count sketch, and
  * percentile winsorization.
  *
  * Determinism contract (driver gate): all scores stay in BIGINT fixed-point
  * or end in a SINGLE double division, ranks are integer, every orderBy has
  * a total tie-break — bit-identical between Spark and the DuckDB oracle.
  *
  * Scale notes are per-operator; the common patterns are the two-phase
  * prefix-sum (a global running sum without a single-reducer window), the
  * value-domain pre-aggregation (windows over the bounded value space, not
  * the corpus), and inverted-index pair generation bounded by group fan-out.
  */
object CorpusOps {
  import Tables.table

  private def toks: Column = split(trim(col("text")), " ")

  /** Word 3-gram shingles (same construction as DedupOps/TextOps). */
  private def shingles(w: Column): Column =
    transform(sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))

  /** Multiplicative doc_id hash — the deterministic shuffle-order family
    * shared with q_train_split / q_stratified_sample / q_token_budget. */
  private def docHash: Column =
    pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))

  // --- q_pack_sequences: concat-and-chunk packing for training batches ---
  // The standard LLM batch-prep step: documents are concatenated in a
  // deterministic hash order and chunked into fixed-length token windows;
  // each document's span is [start_tok, start_tok + toks), so the bins it
  // touches are start_tok div L .. (start_tok + toks - 1) div L.
  //
  // The SPEC (and oracle) is one global running token sum — which at 100 TB
  // would funnel the corpus through a single reducer. The implementation is
  // the same two-phase prefix-sum as q_token_budget: bucket the hash order
  // into 1024 order-preserving ranges (h >> 22), aggregate per-bucket token
  // totals (a 1024-row table), take the exclusive bucket prefix, and run
  // the exact window only WITHIN each bucket — 1024-way parallel, identical
  // output to the naive window.
  private val SeqLen = 512L

  private def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), docHash.as("h"),
        size(toks).cast(LongType).as("toks"))
      .withColumn("bucket", shiftright(col("h"), 22))
    val bucketTotals = docs.groupBy(col("bucket")).agg(sum(col("toks")).as("btoks"))
    // constant partition key: same single-partition execution over the
    // 1024-row bucket table, but the WindowExec "No Partition Defined"
    // warning (a real hazard flag everywhere else) stays meaningful.
    // `bucket * 0` rather than lit(0): a bare literal is constant-folded
    // OUT of the partition spec, resurrecting the warning
    val wB = Window.partitionBy(col("bucket") * lit(0L)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = bucketTotals
      .withColumn("prefix", coalesce(sum(col("btoks")).over(wB), lit(0L)))
      .select(col("bucket"), col("prefix"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(prefixes), Seq("bucket"))
      .withColumn("cum", col("prefix") + sum(col("toks")).over(wIn))
      .withColumn("start_tok", col("cum") - col("toks"))
      .withColumn("start_bin", expr(s"start_tok div $SeqLen"))
      .withColumn("end_bin", expr(s"(cum - 1) div $SeqLen"))
      .select(col("doc_id"), col("toks"), col("start_tok"),
        col("start_bin"), col("end_bin"),
        (col("end_bin") - col("start_bin") + lit(1L)).as("n_bins"))
  }

  private val qPackSequencesSql =
    s"""WITH d AS (
       |  SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |    CAST(SUM(toks) OVER (
       |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM d)
       |SELECT doc_id, toks, cum - toks AS start_tok,
       |  (cum - toks) // $SeqLen AS start_bin,
       |  (cum - 1) // $SeqLen AS end_bin,
       |  (cum - 1) // $SeqLen - (cum - toks) // $SeqLen + 1 AS n_bins
       |FROM c""".stripMargin

  // --- q_bpe_merge: one BPE training step — corpus-wide adjacent-pair top-k
  // The inner loop of BPE vocabulary training: count every adjacent token
  // pair across the corpus and take the most frequent merges. Wordcount-
  // shaped (map-side partial agg); the final rank window's input is bounded
  // by the DISTINCT pair space (≤ vocab²), not the corpus, so the single
  // unpartitioned window is value-domain-bounded — the same argument as
  // q_median_price.
  private val MergeTopK = 20

  private def qBpeMerge(spark: SparkSession, dir: String): DataFrame = {
    // project the token array BEFORE the lambda references it (an inlined
    // split() re-tokenizes once per element — see q_repetition), and
    // tokenize once per DISTINCT text with copy-weighted counts (the
    // DedupOps dedup-first move): doc-level pair count = Σ copies ×
    // per-text occurrences, so the explode runs on distinct texts only
    val w = col("w")
    val pairs = table(spark, dir, "documents")
      .groupBy(col("text")).agg(count(lit(1)).as("n_copies"))
      .select(col("n_copies"), toks.as("w"))
      .filter(size(w) >= 2)
      .select(col("n_copies"), explode(transform(sequence(lit(1), size(w) - 1),
        i => struct(element_at(w, i).as("pair_left"),
          element_at(w, i + 1).as("pair_right")))).as("p"))
      .select(col("n_copies"),
        col("p.pair_left").as("pair_left"), col("p.pair_right").as("pair_right"))
    // explicit top-k BEFORE the rank window (the qKeywordSearch shape):
    // orderBy+limit plans TakeOrderedAndProject — per-task top-k, then a
    // global k-row merge — and the unpartitioned rank window runs over
    // the ≤k limited rows, never the pair domain (plan-pinned by
    // WindowPlanSpec)
    // non-foldable constant partition: input is already limited to ≤k
    // rows by the explicit orderBy+limit, so the single partition is
    // free — and the WindowExec warning stays reserved for real hazards
    val wR = Window.partitionBy(col("cnt") * lit(0L))
      .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
    pairs.groupBy(col("pair_left"), col("pair_right"))
      .agg(sum(col("n_copies")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
      .limit(MergeTopK)
      .withColumn("rank", row_number().over(wR).cast(LongType))
  }

  private val qBpeMergeSql =
    s"""WITH p AS (
       |  SELECT w[i] AS pair_left, w[i+1] AS pair_right
       |  FROM (SELECT string_split(trim(text), ' ') AS w FROM documents) t,
       |       UNNEST(range(1, len(w))) AS r(i)
       |  WHERE len(w) >= 2)
       |SELECT pair_left, pair_right, cnt, rank FROM (
       |  SELECT pair_left, pair_right, COUNT(*) AS cnt,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair_left, pair_right) AS rank
       |  FROM p GROUP BY 1, 2) s
       |WHERE rank <= $MergeTopK""".stripMargin

  // --- q_bpe_train: iterated BPE vocabulary training ---------------------
  // q_bpe_merge is ONE training step; this is the LOOP — the actual BPE
  // training algorithm, run to a fixed merge budget: per iteration, count
  // adjacent pairs corpus-wide, take the argmax (ties broken
  // lexicographically), apply the merge, repeat on the merged corpus.
  // Output is the training artifact: the ordered merge table.
  //
  // The merge is applied as a WORD-BOUNDARY regex replace on the text
  // itself — global regexp_replace is left-to-right non-overlapping, which
  // IS BPE's greedy merge order ('a a a' + merge (a,a) → [a_a, a]) — and
  // the '\b'-delimited pattern is exact because candidate pairs are
  // restricted to \w-only tokens (a WHERE in both engines; merged tokens
  // join with '_', staying \w). RE2 and java.util.regex agree on all of
  // this, so the DuckDB oracle runs the IDENTICAL training loop as 4
  // chained CTE stages — the whole algorithm is hash-gated, like the
  // k-medians loop it copies its driver shape from.
  //
  // Scale shape per iteration: one wordcount-shaped pair agg per DISTINCT
  // text with copy-weighted counts (≡ counting every doc), a 1-row argmax
  // collected to the driver (the k-row k-medians model move), and a
  // map-only rewrite. Corpus passes = merge budget, independent of data;
  // 100× replicated data re-pairs the same distinct texts.
  private[operators] val BpeTrainSteps = 4
  private val WordToken = "^[A-Za-z0-9_]+$"

  private def qBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTrainMerges(spark, dir).toDF("merge_step", "pair_left", "pair_right", "cnt")
  }

  /** The training loop itself, shared by q_bpe_train (which outputs the
    * merge table) and q_bpe_encode (which applies it). The merge table is
    * a bounded model artifact (BpeTrainSteps rows), memoized per corpus
    * identity like the k-medians/PQ codebooks — encode after train costs
    * one rewrite pass, not a second training run. */
  private val bpeMergeCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, String, String, Long)]]

  private def bpeTrainMerges(
      spark: SparkSession, dir: String): Seq[(Long, String, String, Long)] =
    bpeMergeCache.getOrElseUpdate(
      IndexStamp.identity(dir, "documents.parquet", s"bpe-merges-v1-$BpeTrainSteps"),
      bpeTrainMergesUncached(spark, dir))

  private def bpeTrainMergesUncached(
      spark: SparkSession, dir: String): Seq[(Long, String, String, Long)] =
    trainMerges(table(spark, dir, "documents"))

  /** The BPE training loop over an arbitrary (doc_id, text) frame —
    * shared by the inline lanes and the persisted [[TokenizerIndex]]
    * store, so the trained artifact cannot drift between them. */
  private[operators] def trainMerges(
      docs: DataFrame): Seq[(Long, String, String, Long)] = {
    // each iteration's argmax is an ACTION, so the working corpus is
    // persisted per rewrite (what any real BPE trainer materializes) —
    // without it, iteration k replays the dedup + k rewrites from the
    // scan (measured 10.4 → 2.4 s at sf0.1). The \w-token restriction
    // filters on the GROUP KEY, so it commutes to after the pair agg —
    // two regex evals per distinct pair (≤ vocab²), not per occurrence.
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var cur = docs
      .groupBy(col("text")).agg(count(lit(1)).as("n_copies"))
      .select(col("n_copies"), col("text").as("t"))
      .persist()
    persisted += cur
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      for (step <- 1 to BpeTrainSteps) {
        val w = split(trim(col("t")), " ")
        val best = cur
          .filter(size(w) >= 2)
          .select(col("n_copies"), explode(transform(sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("l"), element_at(w, i + 1).as("r")))).as("p"))
          .select(col("n_copies"), col("p.l").as("l"), col("p.r").as("r"))
          .groupBy(col("l"), col("r")).agg(sum(col("n_copies")).as("cnt"))
          .filter(col("l").rlike(WordToken) && col("r").rlike(WordToken))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()(0)
        val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((step.toLong, a, b, cnt))
        if (step < BpeTrainSteps) {
          cur = cur.select(col("n_copies"),
            regexp_replace(col("t"), s"\\b$a $b\\b", s"${a}_$b").as("t"))
            .persist()
          persisted += cur
        }
      }
    } finally persisted.foreach(_.unpersist())
    merges.toSeq
  }

  /** One oracle training stage: pair-count argmax m$k over the working
    * corpus t${k-1}, then the rewritten corpus t$k. Shared by the train
    * and encode oracles. */
  private def bpeStageSql(k: Int): String = {
    val prev = s"t${k - 1}"
    s"""p$k AS (
       |  SELECT w[i] AS l, w[i+1] AS r
       |  FROM (SELECT string_split(trim(t), ' ') AS w FROM $prev) x$k,
       |       UNNEST(range(1, len(w))) AS r$k(i)
       |  WHERE len(w) >= 2),
       |m$k AS (
       |  SELECT l, r, COUNT(*) AS c FROM p$k
       |  WHERE regexp_matches(l, '$WordToken') AND regexp_matches(r, '$WordToken')
       |  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1),
       |t$k AS (
       |  SELECT regexp_replace(t,
       |    '\\b' || (SELECT l FROM m$k) || ' ' || (SELECT r FROM m$k) || '\\b',
       |    (SELECT l FROM m$k) || '_' || (SELECT r FROM m$k), 'g') AS t
       |  FROM $prev)""".stripMargin
  }

  private val qBpeTrainSql = {
    val stages = (1 to BpeTrainSteps).map(bpeStageSql).mkString(",\n")
    val out = (1 to BpeTrainSteps)
      .map(k => s"SELECT CAST($k AS BIGINT) AS merge_step, l AS pair_left, r AS pair_right, c AS cnt FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH t0 AS (SELECT text AS t FROM documents),
       |$stages
       |$out""".stripMargin
  }

  // --- q_bpe_encode: apply the trained merge table to the corpus ---------
  // The other half of the tokenizer lifecycle: q_bpe_train learns the
  // ordered merge list; this query ENCODES every document with it —
  // merges applied in learned order, each as the same word-boundary
  // global regex rewrite used in training (left-to-right non-overlapping
  // ≡ BPE's greedy encode order) — and reports per-doc token counts
  // before/after, i.e. the compression the learned vocabulary buys.
  // Scale shape: training cost as q_bpe_train (passes = merge budget,
  // independent of data scale), then ONE map-only rewrite pass over the
  // documents — merges ride the driver the same way the k-medians
  // centroids do (a bounded model artifact, not data). The DuckDB oracle
  // chains the identical training stages and applies the same nested
  // rewrite, so training AND application are hash-gated together.
  private def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    encodeWith(bpeTrainMerges(spark, dir), table(spark, dir, "documents"))

  /** Apply an ordered merge table to a (doc_id, text) frame — the encode
    * half of the lifecycle, shared by the inline lane and the persisted
    * [[TokenizerIndex]] serving paths. Map-only: the merges ride the
    * driver as a bounded model artifact, like the k-medians centroids. */
  private[operators] def encodeWith(
      merges: Seq[(Long, String, String, Long)], docs: DataFrame): DataFrame = {
    val enc = merges.foldLeft(col("text")) { case (c, (_, a, b, _)) =>
      regexp_replace(c, s"\\b$a $b\\b", s"${a}_$b")
    }
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), " ")).cast(LongType).as("n_tokens_raw"),
      size(split(trim(enc), " ")).cast(LongType).as("n_tokens_bpe"),
      (size(split(trim(col("text")), " ")) - size(split(trim(enc), " ")))
        .cast(LongType).as("n_merged"))
  }

  /** Exposed to [[TokenizerIndex]]: the persisted-tokenizer lane is
    * row-identical and rides this oracle unchanged. */
  private[operators] def qBpeEncodeOracle: String = qBpeEncodeSql

  private val qBpeEncodeSql = {
    val stages = (1 to BpeTrainSteps).map(bpeStageSql).mkString(",\n")
    val enc = (1 to BpeTrainSteps).foldLeft("text") { (c, k) =>
      s"""regexp_replace($c,
         |  '\\b' || (SELECT l FROM m$k) || ' ' || (SELECT r FROM m$k) || '\\b',
         |  (SELECT l FROM m$k) || '_' || (SELECT r FROM m$k), 'g')""".stripMargin
    }
    s"""WITH t0 AS (SELECT text AS t FROM documents),
       |$stages
       |SELECT doc_id,
       |  len(string_split(trim(text), ' ')) AS n_tokens_raw,
       |  len(string_split(trim($enc), ' ')) AS n_tokens_bpe,
       |  len(string_split(trim(text), ' ')) - len(string_split(trim($enc), ' ')) AS n_merged
       |FROM documents""".stripMargin
  }

  // --- q_keyword_search: fixed-point inverted-index retrieval ------------
  // Top-k documents for a term query, scored by Σ_t tf·N·1e6 div df — the
  // tf·N/df family q_tfidf proved rank-equivalent to tf-idf, kept in BIGINT
  // fixed-point so the cross-term SUM stays integer-exact (a double sum
  // would reassociate under partial aggregation). The tf table is filtered
  // to the query terms BEFORE any shuffle (predicate on the scan), df and
  // the corpus count are broadcast, and the final top-k is
  // TakeOrderedAndProject — never a corpus-wide sort.
  // shared with the persisted-postings serving lane ([[SearchIndex]]) —
  // single source of truth, the PackIndex/PackingOps constant lesson
  private[operators] val QueryTerms = Seq("spark", "window", "merge")
  private[operators] val SearchTopK = 20

  private def qKeywordSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(toks).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("term_score", expr("(tf * n_docs * 1000000) div df"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(SearchTopK)
    // rank window runs over the ≤k limited rows, not the corpus
    // (TakeOrderedAndProject feeds it — plan-pinned by WindowPlanSpec);
    // non-foldable constant partition keeps the warning log clean
    scored.withColumn("rank",
      row_number().over(Window.partitionBy(col("score") * lit(0L))
        .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
  }

  // --- q_bm25_search: Okapi BM25 over the same query set -----------------
  // Robertson & Walker's saturation (k1 = 1.2, b = 0.75) kept FIXED-POINT
  // so the lane hash-gates (the suite's established move): with
  // r = dl/avgdl in ppm, norm = 1 − b + b·r and den = tf + k1·norm are
  // ppm integers, sat = tf·(k1+1)/den a ppm ratio, and the idf is the
  // RSJ log ARGUMENT (2N−2df+1)/(2df+1) in milli — the log itself is
  // libm-dependent and would not cross-engine hash; the rational
  // surrogate is documented, monotone in df the same direction, and
  // integer-exact. Reduce-before-multiply keeps every intermediate under
  // Long range at N = 1e9, dl = 1e5 (idf_milli ≤ 2e12, sat_ppm ≤ 2.2e6,
  // product ≤ 4.4e18 < 2^63). Doc length dl is the doc's TOTAL token
  // count (all terms, not just query terms) — the indexed twin serves it
  // from the postings store's ledger, written at ingest from the batch's
  // own tf sums, so BM25 length normalization never re-scans the corpus.
  private[operators] val Bm25K1Ppm = 1200000L
  private[operators] val Bm25BPpm = 750000L

  /** The shared BM25 scoring body: `tf` (doc_id, term, tf) restricted to
    * the query terms, `df` (term, df), `dl` (doc_id, dl), `totals` a
    * 1-row (n_docs, t_tokens). Inline and [[SearchIndex]] lanes feed it
    * from raw text and from the postings store respectively — one
    * arithmetic by construction. */
  private[operators] def bm25Score(
      tf: DataFrame, df: DataFrame, dl: DataFrame, totals: DataFrame,
      topK: Int): DataFrame = {
    val scored = tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("avgdl_milli", expr("(t_tokens * 1000) div n_docs"))
      .withColumn("r_ppm", expr("(dl * 1000000000) div avgdl_milli"))
      .withColumn("norm_ppm",
        expr(s"1000000 - $Bm25BPpm + ($Bm25BPpm * r_ppm) div 1000000"))
      .withColumn("den_ppm",
        expr(s"tf * 1000000 + ($Bm25K1Ppm * norm_ppm) div 1000000"))
      .withColumn("sat_ppm",
        expr(s"(tf * ${1000000L + Bm25K1Ppm} * 1000000) div den_ppm"))
      .withColumn("idf_milli",
        expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        sum(expr("idf_milli * sat_ppm")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    scored.withColumn("rank",
      row_number().over(Window.partitionBy(col("score") * lit(0L))
        .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
  }

  private def qBm25Search(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val allTf = docs
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = allTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val tf = allTf.filter(col("term").isin(QueryTerms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25Score(tf, df, dl, totals, SearchTopK)
  }

  private[operators] val qBm25SearchSql = {
    val terms = QueryTerms.map("'" + _ + "'").mkString(", ")
    s"""WITH alltf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
       |        FROM documents) t
       |  GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM alltf GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_tokens FROM dl),
       |tf AS (SELECT * FROM alltf WHERE term IN ($terms)),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |s AS (
       |  SELECT tf.doc_id, tf.tf, df.df, dl.dl, tot.n_docs,
       |    (tot.t_tokens * 1000) // tot.n_docs AS avgdl_milli
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN tot),
       |s2 AS (
       |  SELECT doc_id, tf, df, n_docs,
       |    1000000 - $Bm25BPpm + ($Bm25BPpm * ((dl * 1000000000) // avgdl_milli)) // 1000000 AS norm_ppm
       |  FROM s),
       |s3 AS (
       |  SELECT doc_id,
       |    ((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1) AS idf_milli,
       |    (tf * ${1000000L + Bm25K1Ppm} * 1000000)
       |      // (tf * 1000000 + ($Bm25K1Ppm * norm_ppm) // 1000000) AS sat_ppm
       |  FROM s2)
       |SELECT doc_id, n_hits, score,
       |  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
       |FROM (
       |  SELECT doc_id, COUNT(*) AS n_hits,
       |    CAST(SUM(idf_milli * sat_ppm) AS BIGINT) AS score
       |  FROM s3 GROUP BY 1) f
       |ORDER BY score DESC, doc_id LIMIT $SearchTopK""".stripMargin
  }

  private[operators] val qKeywordSearchSql = {
    val terms = QueryTerms.map("'" + _ + "'").mkString(", ")
    s"""WITH tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
       |        FROM documents) t
       |  WHERE term IN ($terms)
       |  GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT doc_id, n_hits, score,
       |  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
       |FROM (
       |  SELECT tf.doc_id, COUNT(*) AS n_hits,
       |    CAST(SUM(tf.tf * n.n_docs * 1000000 // df.df) AS BIGINT) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |  GROUP BY 1) s
       |ORDER BY score DESC, doc_id LIMIT $SearchTopK""".stripMargin
  }

  // --- q_doc_rarity: mean corpus document-frequency of a doc's terms -----
  // A quality signal real curation stacks use (rare-vocabulary documents
  // are disproportionately noise; all-boilerplate documents score high):
  // join each document's DISTINCT terms to the corpus df table and average.
  // sum_df stays integer; mean_df is ONE double division. df is
  // vocabulary-bounded — stats-driven broadcast, never a corpus shuffle.
  private def qDocRarity(spark: SparkSession, dir: String): DataFrame = {
    val dt = table(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(toks)).as("term"))
    val df = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    dt.join(df, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("sum_df"))
      .withColumn("mean_df",
        col("sum_df").cast(DoubleType) / col("n_terms").cast(DoubleType))
  }

  private val qDocRaritySql =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, t.term
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents) d,
      |       UNNEST(w) AS t(term)),
      |df AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_terms,
      |  CAST(SUM(df) AS BIGINT) AS sum_df,
      |  CAST(SUM(df) AS BIGINT)::DOUBLE / COUNT(*) AS mean_df
      |FROM dt JOIN df USING (term)
      |GROUP BY 1""".stripMargin

  // --- q_source_similarity: pairwise source overlap (corpus comparison) --
  // Dataset-level dedup triage: Jaccard similarity between every pair of
  // sources over their DISTINCT 3-gram shingle sets — "is dump A just a
  // recrawl of dump B?". Pairs are generated INLINE from each shingle's
  // sorted source set (the q_dedup_ngram_jaccard shape): one groupBy
  // shuffle, per-shingle fan-out bounded by C(|sources|, 2) — never a
  // corpus × corpus join. Source sizes join back as a broadcast.
  private def qSourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    // duplicate documents contribute no new DISTINCT shingles — dedup
    // (source, text) before shingling. distinct() partial-aggregates
    // map-side, so the first shuffle moves only distinct texts (on a
    // crawl-with-recrawls corpus that is the dedup ratio), and the
    // shingle explode runs once per distinct document.
    //
    // Round 17 (r16 verdict #3): the corpus-wide exchanges move xxhash64
    // LONGS, never 3-word shingle strings (the O3 move — the suite-wide
    // 2^-64 collision contract; the oracle still compares strings), and
    // the per-(source, shingle) DISTINCT that used to precede the
    // per-shingle source-set agg is SUBSUMED by collect_set itself (set
    // semantics dedup cross-doc repeats, with map-side partial
    // aggregation) — one corpus-sized exchange on the hashed key where
    // there were two on strings. array_distinct dedups within a doc
    // before the explode, so the exchange input is per-doc distinct.
    // The key is hashed straight from each word TRIPLE (xxhash64 chains
    // its arguments) — no concatenated 3-word string is ever allocated
    // (the DedupOps.ngramTextPairStats move, round 17).
    val sh = table(spark, dir, "documents")
      .select(col("source"), col("text"))
      .distinct()
      .select(col("source"), toks.as("w"))
      .filter(size(w) >= 3)
      .select(col("source"),
        explode(array_distinct(transform(sequence(lit(1), size(w) - 2),
          i => xxhash64(element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2))))).as("sh"))
    val bySh = sh.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .cache() // narrow (long, small array); feeds sizes AND pairs below
    val sizes = bySh.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = bySh
      .select(explode(expr(
        "flatten(transform(ss, (a, i) -> " +
          "transform(slice(ss, i + 2, size(ss)), b -> " +
          "named_struct('source_a', a, 'source_b', b))))")).as("p"))
      .select(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "n_a")), Seq("source_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_inter")).cast(DoubleType)).as("jaccard"))
  }

  private val qSourceSimilaritySql =
    """WITH sh AS (
      |  SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM (SELECT source, string_split(trim(text), ' ') AS w FROM documents) t,
      |       UNNEST(range(1, len(w) - 1)) AS r(i)
      |  WHERE len(w) >= 3),
      |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_inter,
      |  n_inter::DOUBLE / (sa.n + sb.n - n_inter) AS jaccard
      |FROM inter
      |JOIN sz sa ON sa.source = source_a
      |JOIN sz sb ON sb.source = source_b""".stripMargin

  // --- q_kmv_distinct: k-minimum-values distinct-count sketch ------------
  // The mergeable sketch a 100 TB engine estimates cardinalities with: per
  // source, keep the k smallest DISTINCT portable hashes of its shingles;
  // D̂ = (k-1)·M / h_(k) for hash space [0, M). Deterministic (portable
  // polynomial hash, integer estimator) → fully oracle-checkable, unlike
  // HLL whose harmonic mean needs floats. The sketch is ONE bounded
  // aggregation ([[graft.functions.BottomKDistinct]], round 17): each
  // task's partial buffer keeps its local k minima — the sketch property
  // itself — and ships ≤k longs per source. Exact counts ride along (same
  // aggregation) to show estimator error.
  private val KmvK = 64
  private val HashMod = 1000000007L
  private val KmvNum: Long = (KmvK - 1).toLong * HashMod // integer-exact numerator

  /** Distinct (source, portable shingle hash) pairs — the KMV sketch
    * input. The native single-pass expression (codegen'd, per-doc deduped
    * — PolyShingleHashesExpr) emits each document's distinct shingle
    * hashes directly: the explode and the distinct shuffle move LONGS,
    * never shingle strings, and no interpreted char fold runs per
    * occurrence. explode() drops null arrays — the <3-token filter. */
  private def kmvHashed(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("source"), col("text"))
      .distinct() // duplicate docs add no distinct hashes (see q_source_similarity)
      .select(col("source"),
        explode(graft.functions.PolyMinHash.shingleHashes(col("text"))).as("h"))
      .distinct()

  /** Bounded bottom-k per source in ONE aggregation (round 17, r16
    * verdict #4 — [[graft.functions.BottomKDistinct]]): replaces the
    * rank-window formulation, whose per-source sort (WindowGroupLimit-
    * pruned but still a window exchange + sort) and separate exact-count
    * agg + join cost three plan stages where one map-side-combined
    * aggregation suffices. The k smallest of a set are arrival-order-
    * independent, so the result is bit-identical to the window's. */
  private lazy val bottomK =
    udaf(new graft.functions.BottomKDistinct(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)

  private def qKmvDistinct(spark: SparkSession, dir: String): DataFrame =
    kmvHashed(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_exact"), bottomK(col("h")).as("mins"))
      // kc === KmvK ⇔ the source has at least k distinct hashes
      .filter(size(col("mins")) === KmvK)
      .select(col("source"), col("n_exact"),
        element_at(col("mins"), KmvK).as("kth_min"))
      .withColumn("kmv_estimate", expr(s"$KmvNum div greatest(kth_min, 1L)"))

  private val qKmvDistinctSql =
    s"""WITH sh AS (
       |  SELECT DISTINCT source,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [ascii(substring(s, i, 1))::BIGINT FOR i IN range(1, length(s)+1)]),
       |      (acc, c) -> (acc*31 + c) % $HashMod) AS h
       |  FROM (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |        FROM (SELECT source, string_split(trim(text), ' ') AS w FROM documents) t,
       |             UNNEST(range(1, len(w) - 1)) AS r(i)
       |        WHERE len(w) >= 3) q),
       |ranked AS (
       |  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM sh),
       |kth AS (
       |  SELECT source, MAX(h) AS kth_min, COUNT(*) AS kc
       |  FROM ranked WHERE r <= $KmvK GROUP BY 1),
       |exact AS (SELECT source, COUNT(*) AS n_exact FROM sh GROUP BY 1)
       |SELECT e.source, n_exact, kth_min,
       |  $KmvNum // greatest(kth_min, 1) AS kmv_estimate
       |FROM exact e JOIN kth k ON e.source = k.source
       |WHERE kc = $KmvK""".stripMargin

  // --- q_kmv_union: sketch MERGE — union/intersection estimates ----------
  // The property that makes sketches the 100 TB tool: two sources' KMV
  // sketches merge WITHOUT rescanning either corpus — the k smallest of
  // the union of two k-min sets IS the union's sketch. Per source pair:
  // D̂(A∪B) from the merged sketch, D̂(A∩B) by inclusion-exclusion
  // (clamped at 0). All work after sketch construction happens on a
  // |sources|-row table of k-long arrays — constant in corpus size.
  // Deterministic integer arithmetic end to end → fully oracle-checked.
  private def qKmvUnion(spark: SparkSession, dir: String): DataFrame = {
    // same one-aggregation bottom-k as qKmvDistinct (already sorted
    // ascending — the window+sort_array(collect_list) pair it replaces)
    val sketches = kmvHashed(spark, dir)
      .groupBy(col("source"))
      .agg(bottomK(col("h")).as("mins"))
      .filter(size(col("mins")) === KmvK)
      .select(col("source"), col("mins"))
    val a = sketches.select(col("source").as("source_a"), col("mins").as("la"))
    val b = sketches.select(col("source").as("source_b"), col("mins").as("lb"))
    a.crossJoin(b).filter(col("source_a") < col("source_b"))
      .withColumn("est_a",
        expr(s"$KmvNum div greatest(element_at(la, $KmvK), 1L)"))
      .withColumn("est_b",
        expr(s"$KmvNum div greatest(element_at(lb, $KmvK), 1L)"))
      .withColumn("est_union",
        expr(s"$KmvNum div greatest(element_at(array_sort(array_union(la, lb)), $KmvK), 1L)"))
      .withColumn("est_intersection",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .select(col("source_a"), col("source_b"),
        col("est_a"), col("est_b"), col("est_union"), col("est_intersection"))
  }

  private val qKmvUnionSql =
    s"""WITH sh AS (
       |  SELECT DISTINCT source,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [ascii(substring(s, i, 1))::BIGINT FOR i IN range(1, length(s)+1)]),
       |      (acc, c) -> (acc*31 + c) % $HashMod) AS h
       |  FROM (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |        FROM (SELECT source, string_split(trim(text), ' ') AS w FROM documents) t,
       |             UNNEST(range(1, len(w) - 1)) AS r(i)
       |        WHERE len(w) >= 3) q),
       |ranked AS (
       |  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM sh),
       |sk AS (
       |  SELECT source, list_sort(list(h)) AS mins
       |  FROM ranked WHERE r <= $KmvK GROUP BY 1 HAVING COUNT(*) = $KmvK),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    $KmvNum // greatest(a.mins[$KmvK], 1) AS est_a,
       |    $KmvNum // greatest(b.mins[$KmvK], 1) AS est_b,
       |    $KmvNum // greatest(list_sort(list_distinct(a.mins || b.mins))[$KmvK], 1)
       |      AS est_union
       |  FROM sk a, sk b WHERE a.source < b.source)
       |SELECT source_a, source_b, est_a, est_b, est_union,
       |  greatest(0, est_a + est_b - est_union) AS est_intersection
       |FROM pairs""".stripMargin

  // --- q_winsorize: percentile clamp via the value-domain trick ----------
  // Outlier-robust length statistics per source: clamp n_chars to the exact
  // [p5, p95] corpus percentiles. The percentile ranks use pure integer
  // ceilings ((N·p + 99) div 100) and the cumulative window runs over the
  // DISTINCT value domain (hundreds of rows), not the corpus — the
  // q_median_price argument. Bounds broadcast back; per-source stats are
  // one map-side-combined agg; mean is the single final double division.
  private def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("source"), col("n_chars"))
    val vc = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    // non-foldable constant partition (see qPackSequences): the cumulative
    // window runs over the distinct value domain in one partition either
    // way, but the warning stays reserved for genuine corpus-wide windows
    val wV = Window.partitionBy(col("n_chars") * lit(0L)).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.withColumn("cum", sum(col("cnt")).over(wV))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    val bounds = cum.crossJoin(tot).agg(
      min(when(col("cum") >= expr("(n_total * 5 + 99) div 100"), col("n_chars"))).as("lo"),
      min(when(col("cum") >= expr("(n_total * 95 + 99) div 100"), col("n_chars"))).as("hi"))
    val clamped = least(greatest(col("n_chars"), col("lo")), col("hi"))
    docs.crossJoin(broadcast(bounds))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("n_chars") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        sum(clamped).as("sum_winsorized"))
      .withColumn("mean_winsorized",
        col("sum_winsorized").cast(DoubleType) / col("n_docs").cast(DoubleType))
  }

  private val qWinsorizeSql =
    """WITH vc AS (SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT n_chars,
      |    SUM(cnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM vc),
      |tot AS (SELECT COUNT(*) AS n_total FROM documents),
      |b AS (
      |  SELECT
      |    MIN(CASE WHEN cum >= (n_total * 5 + 99) // 100 THEN n_chars END) AS lo,
      |    MIN(CASE WHEN cum >= (n_total * 95 + 99) // 100 THEN n_chars END) AS hi
      |  FROM cum CROSS JOIN tot)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(SUM(least(greatest(n_chars, lo), hi)) AS BIGINT) AS sum_winsorized,
      |  CAST(SUM(least(greatest(n_chars, lo), hi)) AS BIGINT)::DOUBLE / COUNT(*)
      |    AS mean_winsorized
      |FROM documents CROSS JOIN b
      |GROUP BY source""".stripMargin

  // --- q_length_quantiles: exact grouped percentiles, value-domain -------
  // Per-source p50/p90/p99 of document length — the length-distribution
  // profile a curation run gates on. Same exact rank-based definition as
  // q_median_price/q_winsorize (lowest value whose cumulative count reaches
  // ceil(p·n/100), pure integer ceilings): the cumulative window runs over
  // the (source × distinct value) domain, not the corpus, and the final
  // percentile extraction is one map-side-combinable agg per source.
  private def qLengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("source"), col("n_chars"))
    val vc = docs.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("cnt"))
    val wV = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.withColumn("cum", sum(col("cnt")).over(wV))
    val tot = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    def pct(p: Int): Column =
      min(when(col("cum") >= expr(s"(n_docs * $p + 99) div 100"), col("n_chars")))
    cum.join(broadcast(tot), Seq("source"))
      .groupBy(col("source"))
      .agg(first(col("n_docs")).as("n_docs"),
        pct(50).as("p50"), pct(90).as("p90"), pct(99).as("p99"))
  }

  private val qLengthQuantilesSql =
    """WITH vc AS (
      |  SELECT source, n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_chars,
      |    SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM vc),
      |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT source, ANY_VALUE(n_docs) AS n_docs,
      |  MIN(CASE WHEN cum >= (n_docs * 50 + 99) // 100 THEN n_chars END) AS p50,
      |  MIN(CASE WHEN cum >= (n_docs * 90 + 99) // 100 THEN n_chars END) AS p90,
      |  MIN(CASE WHEN cum >= (n_docs * 99 + 99) // 100 THEN n_chars END) AS p99
      |FROM cum JOIN tot USING (source)
      |GROUP BY source""".stripMargin

  // --- q_chunk_overlap: sliding-window document chunking -----------------
  // Context-window preparation: split each document into token chunks of
  // W=32 with stride S=24 (8-token overlap), the standard long-document
  // treatment before tokenization/packing. Chunk count is closed-form in
  // INTEGER arithmetic — nc = 1 + ceil((n-W)/S) via div — so both engines
  // agree exactly; the last chunk is the only short one. Pure per-row
  // explode: no shuffle at all, embarrassingly parallel at any corpus
  // size (output volume ≈ n/S tokens per doc ≈ 1.33× input).
  private val ChunkW = 32
  private val ChunkS = 24

  private def qChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .withColumn("n", size(col("w")).cast(LongType))
      .withColumn("nc", when(col("n") <= ChunkW, lit(1L))
        .otherwise(expr(s"(n - $ChunkW + $ChunkS - 1) div $ChunkS") + 1L))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), col("nc") - 1L)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * ChunkS)
      .withColumn("ck",
        slice(col("w"), (col("start_tok") + 1L).cast("int"), lit(ChunkW)))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ck")).cast(LongType).as("n_tok"),
        array_join(col("ck"), " ").as("chunk_text"))

  private val qChunkOverlapSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |c AS (
       |  SELECT doc_id, w, len(w) AS n,
       |    CASE WHEN len(w) <= $ChunkW THEN 1
       |         ELSE (len(w) - $ChunkW + $ChunkS - 1) // $ChunkS + 1 END AS nc
       |  FROM t WHERE len(w) > 0),
       |x AS (
       |  SELECT doc_id, w, i AS chunk_idx, i * $ChunkS AS start_tok
       |  FROM c, UNNEST(range(0, nc)) AS r(i))
       |SELECT doc_id, chunk_idx, start_tok,
       |  len(list_slice(w, start_tok + 1, start_tok + $ChunkW)) AS n_tok,
       |  array_to_string(list_slice(w, start_tok + 1, start_tok + $ChunkW), ' ')
       |    AS chunk_text
       |FROM x""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_chunk_overlap", qChunkOverlap, Some(qChunkOverlapSql)),
    QueryDef("q_length_quantiles", qLengthQuantiles, Some(qLengthQuantilesSql)),
    QueryDef("q_pack_sequences", qPackSequences, Some(qPackSequencesSql)),
    QueryDef("q_bpe_merge", qBpeMerge, Some(qBpeMergeSql)),
    QueryDef("q_bpe_train", qBpeTrain, Some(qBpeTrainSql)),
    QueryDef("q_bpe_encode", qBpeEncode, Some(qBpeEncodeSql)),
    QueryDef("q_keyword_search", qKeywordSearch, Some(qKeywordSearchSql)),
    QueryDef("q_bm25_search", qBm25Search, Some(qBm25SearchSql)),
    QueryDef("q_doc_rarity", qDocRarity, Some(qDocRaritySql)),
    QueryDef("q_source_similarity", qSourceSimilarity, Some(qSourceSimilaritySql)),
    QueryDef("q_kmv_distinct", qKmvDistinct, Some(qKmvDistinctSql)),
    QueryDef("q_kmv_union", qKmvUnion, Some(qKmvUnionSql)),
    QueryDef("q_winsorize", qWinsorize, Some(qWinsorizeSql)))
}
