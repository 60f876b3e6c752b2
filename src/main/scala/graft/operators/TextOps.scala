package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over `documents` — the LLM-training-pipeline
  * surface (builder prompt): token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. Everything is a pure Column
  * composition (whole-stage codegen, no UDFs), embarrassingly parallel per
  * document — the shape that scales linearly to 100 TB: no shuffle at all,
  * a single scan per query.
  *
  * Cross-engine determinism: token arithmetic is integer; ratios are a
  * single double division performed identically in the DuckDB oracle;
  * rolling hashes fold left from 0 in both engines.
  */
object TextOps {
  import Tables.table

  private def toks: Column = split(trim(col("text")), " ")

  /** Sum an integer-producing lambda over an array: left fold from 0L. */
  private def sumOver(arr: Column, f: Column => Column): Column =
    aggregate(transform(arr, f), lit(0L), (acc, x) => acc + x)

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  // --- q_text_stats: token counting + quality scoring --------------------
  private def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val w = toks
    val nTokens = size(w).cast(LongType)
    val nStop = sumOver(w, t => when(t.isin(Stopwords: _*), 1L).otherwise(0L))
    val sumLen = sumOver(w, t => length(t).cast(LongType))
    val stopRatio = nStop.cast(DoubleType) / nTokens.cast(DoubleType)
    d.select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      nTokens.as("n_tokens"),
      size(array_distinct(w)).cast(LongType).as("n_distinct_tokens"),
      stopRatio.as("stopword_ratio"),
      (sumLen.cast(DoubleType) / nTokens.cast(DoubleType)).as("avg_token_len"),
      (least(lit(1.0), nTokens.cast(DoubleType) / 100.0)
        * (lit(1.0) - stopRatio)).as("quality_score"))
  }

  private val qTextStatsSql =
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len(string_split(trim(text), ' ')) AS n_tokens,
       |  len(list_distinct(string_split(trim(text), ' '))) AS n_distinct_tokens,
       |  list_reduce(list_prepend(0::BIGINT, [CASE WHEN t IN (${Stopwords.map("'" + _ + "'").mkString(",")}) THEN 1::BIGINT ELSE 0::BIGINT END FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)::DOUBLE
       |    / len(string_split(trim(text), ' ')) AS stopword_ratio,
       |  list_reduce(list_prepend(0::BIGINT, [length(t)::BIGINT FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)::DOUBLE
       |    / len(string_split(trim(text), ' ')) AS avg_token_len,
       |  least(1.0, len(string_split(trim(text), ' ')) / 100.0)
       |    * (1.0 - list_reduce(list_prepend(0::BIGINT, [CASE WHEN t IN (${Stopwords.map("'" + _ + "'").mkString(",")}) THEN 1::BIGINT ELSE 0::BIGINT END FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)::DOUBLE
       |      / len(string_split(trim(text), ' '))) AS quality_score
       |FROM documents""".stripMargin

  // --- q_char_diversity: integer-exact low-entropy proxies ---------------
  // The C4/Gopher-family "gibberish and keyboard-mash" signals without the
  // cross-engine hazard of a float entropy (Σ p·ln p differs in final
  // ulps between libm implementations): distinct-character count and the
  // top character's permille share — a near-constant doc ("aaaa…") shows
  // top_char_permille → 1000, low n_distinct_chars. Round-10 shape: the
  // counters come from the native single-pass expression
  // ([[graft.functions.CharDiversity]], bit-parity vs the composed
  // explode+groupBy pinned in NativeVsComposedSpec), so the signal is
  // MAP-ONLY — the previous per-character explode pushed ~250 shuffled
  // rows per document through two exchanges; this pushes zero.
  private def qCharDiversity(spark: SparkSession, dir: String): DataFrame =
    charDiversityOf(table(spark, dir, "documents"))

  /** The q_char_diversity body over any (doc_id, text) frame — exposed
    * to the spec so the NULL-text contract is pinned directly. */
  private[operators] def charDiversityOf(docs: DataFrame): DataFrame =
    docs
      // coalesce to the empty-doc counters: the native expression is
      // null-propagating, but the lane's contract (and the COUNT-based
      // oracle) null-FILLS — a NULL text must score as [0,0,0], not NULL
      .select(col("doc_id"),
        coalesce(graft.functions.CharDiversity.stats(col("text")),
          array(lit(0L), lit(0L), lit(0L))).as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).as("n_chars_total"),
        element_at(col("st"), 2).as("n_distinct_chars"),
        element_at(col("st"), 3).as("top_char_count"))
      .withColumn("top_char_permille",
        expr("CASE WHEN n_chars_total > 0" +
          " THEN (top_char_count * 1000) div n_chars_total ELSE 0 END"))

  private val qCharDiversitySql =
    """WITH cc AS (
      |  SELECT text, substring(text, i, 1) AS c
      |  FROM (SELECT DISTINCT text FROM documents WHERE length(text) > 0) t,
      |       UNNEST(range(1, length(text) + 1)) AS r(i)),
      |pc AS (SELECT text, c, COUNT(*) AS cnt FROM cc GROUP BY 1, 2),
      |pt AS (
      |  SELECT text,
      |    CAST(SUM(cnt) AS BIGINT) AS n_chars_total,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
      |    CAST(MAX(cnt) AS BIGINT) AS top_char_count
      |  FROM pc GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(pt.n_chars_total, 0) AS n_chars_total,
      |  COALESCE(pt.n_distinct_chars, 0) AS n_distinct_chars,
      |  COALESCE(pt.top_char_count, 0) AS top_char_count,
      |  COALESCE((pt.top_char_count * 1000) // pt.n_chars_total, 0) AS top_char_permille
      |FROM documents d LEFT JOIN pt USING (text)""".stripMargin

  // --- q_lang_id: marker-token language heuristic ------------------------
  // Counts per-language function-word markers over the token list; argmax
  // with fixed priority tie-break (en > de > fr > es). The synthetic corpus
  // shares one vocabulary, so the value of the heuristic here is its
  // deterministic, shuffle-free evaluation — the operator shape is what
  // transfers to real corpora.
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  private def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val w = toks
    val scores = Markers.map { case (lang, ms) =>
      lang -> sumOver(w, t => when(t.isin(ms: _*), 1L).otherwise(0L))
    }
    val m = greatest(scores.map(_._2): _*)
    val pred = scores.init.foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (lang, s)) => acc.when(s === m, lang)
    }.otherwise(scores.last._1)
    d.select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      pred.as("predicted_lang"))
  }

  private val qLangIdSql = {
    def cnt(ms: Seq[String]) =
      s"list_reduce(list_prepend(0::BIGINT, [CASE WHEN t IN (${ms.map("'" + _ + "'").mkString(",")}) THEN 1::BIGINT ELSE 0::BIGINT END FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)"
    val scores = Markers.map { case (lang, ms) => lang -> cnt(ms) }
    val m = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.init.map { case (lang, s) => s"WHEN $s = $m THEN '$lang'" }
      .mkString(" ")
    s"""SELECT doc_id, lang AS labeled_lang,
       |  CASE $cases ELSE '${scores.last._1}' END AS predicted_lang
       |FROM documents""".stripMargin
  }

  // --- q_fingerprint: polynomial rolling hash over characters ------------
  // acc = (acc*31 + ascii(char)) mod 1e9+7, left fold from 0 — identical
  // fold order in Spark `aggregate` and DuckDB `list_reduce`.
  private def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    // the interpreted char fold runs once per DISTINCT text (the
    // dedup-first move); per-doc rows expand through the narrow
    // (doc_id, tkey) table
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val chars = split(col("text"), "")
    val fp = aggregate(
      transform(chars, c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
    val perText = d.groupBy(col("tkey")).agg(first(col("text")).as("text"))
      .select(col("tkey"), fp.as("fingerprint"))
    d.select(col("doc_id"), col("tkey")).join(perText, "tkey")
      .select(col("doc_id"), col("fingerprint"))
  }

  private val qFingerprintSql =
    """SELECT doc_id,
      |  list_reduce(list_prepend(0::BIGINT,
      |    [ascii(substring(text, i, 1))::BIGINT FOR i IN range(1, length(text)+1)]),
      |    (acc, c) -> (acc*31 + c) % 1000000007) AS fingerprint
      |FROM documents""".stripMargin

  // --- q_top_terms: corpus term frequencies (wordcount at scale) ---------
  // explode → hash-agg with map-side combine → deterministic top-20.
  private def qTopTerms(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)

  private val qTopTermsSql =
    """SELECT term, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents) t
      |GROUP BY term
      |ORDER BY n DESC, term
      |LIMIT 20""".stripMargin

  // --- q_train_split: deterministic train/validation/test assignment -----
  // A training-data pipeline must split reproducibly, independent of row
  // order, partitioning, and engine: assign by a multiplicative hash of
  // the stable doc_id (Knuth constant), bucket mod 100 → 80/10/10. The
  // arithmetic is plain BIGINT ops, so the DuckDB oracle computes the
  // identical assignment. (For string keys at 100 TB swap in xxhash64 —
  // same shape; the portable arithmetic keeps this one oracle-checked.)
  private def qTrainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
    val splitCol = when(bucket < 80, "train")
      .when(bucket < 90, "validation").otherwise("test")
    table(spark, dir, "documents")
      .select(col("source"), splitCol.as("split"),
        size(split(trim(col("text")), " ")).cast(LongType).as("toks"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast(LongType).as("n_tokens"))
  }

  private val qTrainSplitSql =
    """SELECT source,
      |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
      |       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'validation'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
      |FROM documents
      |GROUP BY 1, 2""".stripMargin

  // --- q_curation: the end-to-end curation funnel ------------------------
  // What a training-data pipeline actually runs: quality gate → exact-dedup
  // keeper → train-split assignment, reported as per-stage attrition
  // (docs + tokens surviving each stage). One scan computes all per-doc
  // flags; the only shuffle is the keeper window — and the document text
  // is projected down to xxhash64(text) BEFORE that window, so both the
  // exchange KEY and the shuffled row payload are fixed-width (at 100 TB,
  // partitioning by raw text would move the full corpus body through the
  // exchange twice). Collision contract: 1e-15 per pair — identical to
  // the hashed-shingle intersect the verified-dedup path already accepts;
  // the oracle keeps PARTITION BY text as the semantic spec, and the two
  // agree absent a 64-bit collision.
  private def qCuration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = toks
    val nTokens = size(w).cast(LongType)
    val nStop = sumOver(w, t => when(t.isin(Stopwords: _*), 1L).otherwise(0L))
    val stopRatio = nStop.cast(DoubleType) / nTokens.cast(DoubleType)
    val quality = least(lit(1.0), nTokens.cast(DoubleType) / 100.0) * (lit(1.0) - stopRatio)
    val keeper = min(col("doc_id")).over(Window.partitionBy(col("text_h")))
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
    val flags = table(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("text_h"),
        nTokens.as("n_toks"), quality.as("q"),
        (bucket < 80).as("in_train"))
      .withColumn("is_keeper", col("doc_id") === keeper)
      .withColumn("qual_ok", col("q") >= 0.5 && col("n_toks") >= 20)
    flags.select(col("n_toks"), explode(array(
        struct(lit("1_total").as("stage"), lit(true).as("keep")),
        struct(lit("2_quality").as("stage"), col("qual_ok").as("keep")),
        struct(lit("3_dedup").as("stage"), (col("qual_ok") && col("is_keeper")).as("keep")),
        struct(lit("4_train").as("stage"),
          (col("qual_ok") && col("is_keeper") && col("in_train")).as("keep")))).as("s"))
      .filter(col("s.keep"))
      .groupBy(col("s.stage").as("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).cast(LongType).as("n_tokens"))
  }

  private val qCurationSql = {
    val nToks = "len(string_split(trim(text), ' '))"
    val nStop = s"list_reduce(list_prepend(0::BIGINT, [CASE WHEN t IN (${Stopwords.map("'" + _ + "'").mkString(",")}) THEN 1::BIGINT ELSE 0::BIGINT END FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)"
    s"""WITH f AS (
       |  SELECT doc_id, $nToks AS n_toks,
       |    least(1.0, $nToks / 100.0) * (1.0 - $nStop::DOUBLE / $nToks) AS q,
       |    doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_keeper,
       |    (doc_id * 2654435761) % 4294967296 % 100 < 80 AS in_train
       |  FROM documents),
       |g AS (SELECT *, q >= 0.5 AND n_toks >= 20 AS qual_ok FROM f)
       |SELECT '1_total' AS stage, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM g
       |UNION ALL
       |SELECT '2_quality', COUNT(*), CAST(SUM(n_toks) AS BIGINT) FROM g WHERE qual_ok
       |UNION ALL
       |SELECT '3_dedup', COUNT(*), CAST(SUM(n_toks) AS BIGINT) FROM g WHERE qual_ok AND is_keeper
       |UNION ALL
       |SELECT '4_train', COUNT(*), CAST(SUM(n_toks) AS BIGINT) FROM g
       |WHERE qual_ok AND is_keeper AND in_train""".stripMargin
  }

  // --- q_bpe_tokens: BPE-style pre-tokenization counts -------------------
  // The pre-tokenizer split BPE vocabularies are trained over: letter
  // runs, digit runs, and punctuation runs as separate tokens (the
  // GPT-2-family shape, minus lookaheads so the pattern is portable
  // between Java regex and DuckDB's RE2). Token counting at corpus scale
  // is a pure per-row map — no shuffle until the final per-source rollup.
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  private def qBpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val bpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast(LongType)
    val ws = size(split(trim(col("text")), " ")).cast(LongType)
    table(spark, dir, "documents")
      .select(col("source"), bpe.as("bpe"), ws.as("ws"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).cast(LongType).as("n_bpe_tokens"),
        sum(col("ws")).cast(LongType).as("n_ws_tokens"))
  }

  private val qBpeTokensSql =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(text, '$BpePattern'))) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_ws_tokens
       |FROM documents GROUP BY source""".stripMargin

  // --- q_contamination: train→test n-gram leakage check ------------------
  // Eval hygiene for a training pipeline: how much of each TEST document's
  // 3-gram content also appears anywhere in the TRAIN split. The train
  // side collapses to its DISTINCT shingle set before the join, so the
  // work is ∝ test-side shingle rows joined against a vocabulary-bounded
  // set — never pairwise in documents (no df cap needed, unlike the
  // all-pairs Jaccard).
  private def qContamination(spark: SparkSession, dir: String): DataFrame = {
    // Exact-dedup first (the DedupOps text-level move): shingle sets are
    // text functions, so they're built once per DISTINCT text; the
    // train/test SPLIT is per-document (hash bucket), so membership
    // filters ride the narrow (doc_id, tkey) table — a text is in the
    // train set iff ANY of its copies lands in a train bucket, and every
    // test copy of one text shares the same counts, expanded at the end.
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
    val t = table(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val members = t.select(col("doc_id"), col("tkey"), bucket.as("bucket"))
    val tsh = t.groupBy(col("tkey")).agg(first(col("text")).as("text"))
      .select(col("tkey"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("tkey"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2))))).as("shingle"))
      .cache()
    val trainKeys = members.filter(col("bucket") < 80).select(col("tkey")).distinct()
    val trainSh = tsh.join(trainKeys, "tkey").select(col("shingle")).distinct()
    val totalsT = tsh.groupBy(col("tkey")).agg(count(lit(1)).as("n_shingles"))
    val sharedT = tsh.join(trainSh, "shingle")
      .groupBy(col("tkey")).agg(count(lit(1)).as("n_shared"))
    members.filter(col("bucket") >= 90)
      .join(totalsT, "tkey")
      .join(sharedT, Seq("tkey"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast(DoubleType)
          / col("n_shingles").cast(DoubleType)).as("contamination"))
  }

  private val qContaminationSql =
    """WITH sh AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
      |    shingle
      |  FROM (
      |    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents) t,
      |         UNNEST(range(1, len(w) - 1)) AS r(i)
      |    WHERE len(w) >= 3) s),
      |train AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 80),
      |test AS (SELECT doc_id, shingle FROM sh WHERE bucket >= 90),
      |totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM test GROUP BY 1),
      |shared AS (
      |  SELECT doc_id, COUNT(*) AS n_shared FROM test JOIN train USING (shingle)
      |  GROUP BY 1)
      |SELECT t.doc_id, t.n_shingles,
      |  COALESCE(s.n_shared, 0) AS n_shared,
      |  COALESCE(s.n_shared, 0)::DOUBLE / t.n_shingles AS contamination
      |FROM totals t LEFT JOIN shared s ON t.doc_id = s.doc_id""".stripMargin

  // --- q_contamination_bloom: decontamination via a broadcast Bloom filter
  // Same output (and SAME oracle) as q_contamination, restructured for the
  // 100-TB direction. At production scale the TRAIN side is the huge one
  // and the TEST (eval) shingle vocabulary is bounded, so the right shape
  // is: build a Bloom filter over the DISTINCT TEST shingles (fixed-size
  // bit array, broadcastable), probe every distinct TRAIN shingle against
  // it MAP-ONLY, and only probable-shared survivors reach the exact
  // intersection — the train-side shuffle join on raw shingle strings is
  // replaced by a broadcast-hash probe plus a join whose input is ∝ the
  // truly-shared set (+ the m/n-controlled false-positive trickle).
  // Bloom filters have no false negatives, and the exact semi-join against
  // the test vocabulary removes false positives, so the output is
  // bit-identical to the exact query by construction — which is why this
  // lane can ride q_contamination's oracle on the full hash gate.
  //
  // The filter is a plain DataFrame of ≤ m/64 (word_idx, word) rows —
  // bit positions from two independent xxhash64 draws, OR-folded per
  // 64-bit word by a map-side-combined bit_or agg — broadcast into the
  // probe joins; everything stays inside whole-stage codegen (no UDF, no
  // driver-side bit array). m is sized ~16 bits/element here (FP ~2⁻¹⁰ at
  // the gate SFs); production sizing scales m with the eval vocabulary,
  // not the corpus.
  private val BloomBits = 1L << 18

  // two bit positions per element (k=2); seed the second draw by hashing
  // the shingle together with a constant column
  private def bloomP1(c: Column) = pmod(xxhash64(c), lit(BloomBits))
  private def bloomP2(c: Column) = pmod(xxhash64(c, lit(2L)), lit(BloomBits))

  /** Bloom word table over a shingle vocabulary: bit positions from two
    * independent xxhash64 draws, OR-folded per 64-bit word by a
    * map-side-combined bit_or agg — a plain DataFrame of ≤ m/64
    * (word_idx, word) rows, broadcastable into the probe joins. */
  private def bloomWordsOf(sh: DataFrame): DataFrame = sh
    .select(explode(array(bloomP1(col("shingle")), bloomP2(col("shingle")))).as("p"))
    .select(shiftright(col("p"), 6).as("word_idx"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("bit"))
    .groupBy(col("word_idx")).agg(expr("bit_or(bit)").as("word"))

  // --- persisted Bloom artifact (round 17, r16 verdict #5) ---------------
  // The filter is a pure function of the eval (contamination) vocabulary
  // — itself persisted in the [[EvalIndex]] store — yet the lane rebuilt
  // it per run from a full corpus re-shingle. It is now materialized once
  // per eval-store state ([[DerivedArtifact]] watermark: any eval append/
  // takedown/compact re-derives) and the serve path only PROBES: build
  // cost leaves the plan (§2.4), exactly like the LM totals artifacts.
  private def bloomDirFor(dir: String): String = {
    val key = IndexStamp.dirKey(
      IndexStamp.identity(dir, "documents.parquet", "contambloom-v1"))
    StoreRoot.dir(s"graft-contambloom-$key")
  }

  private val BloomWordsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("word_idx",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("word",
      org.apache.spark.sql.types.LongType)))

  private def ensureBloomWords(
      spark: SparkSession, dir: String, evalDir: String): String = {
    val adir = bloomDirFor(dir)
    val live = s"$adir/words.parquet"
    DerivedArtifact.ensureWriter(spark, adir, "contambloom-build")(
      stale = DerivedArtifact.readWatermark(spark, live)
        .forall(DerivedArtifact.storesMtime(spark, Seq(evalDir)) > _)) {
      val preRead = DerivedArtifact.storesMtime(spark, Seq(evalDir))
      AtomicPublish.stageAndRename(spark, adir, ".words.tmp", "words.parquet") {
        tmp =>
          bloomWordsOf(EvalIndex.shingles(spark, evalDir)).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          DerivedArtifact.writeWatermark(spark, tmp, preRead)
      }
    }
    live
  }

  private def qContaminationBloom(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
    val t = table(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val members = t.select(col("doc_id"), col("tkey"), bucket.as("bucket"))
    // TEST side from the persisted eval store (round 17): the eval split
    // (splitBucket >= 90 — the same bucket arithmetic as `bucket` here)
    // is shingled once at [[EvalIndex]] build and served doc-attributed;
    // the per-run work is the TRAIN side — at production the huge,
    // per-run side by design. Output rows stay hash-gated against
    // DuckDB's fully-inline recomputation (same oracle as
    // q_contamination), so store ≡ inline is re-proven at every Verify.
    val evalDir = EvalIndex.ensureIndex(spark, dir)
    val evalDocSh = EvalIndex.docShingles(spark, evalDir)
    val testSh = evalDocSh.select(col("shingle")).distinct()
    val words = spark.read.schema(BloomWordsSchema)
      .parquet(ensureBloomWords(spark, dir, evalDir))
    val trainKeys = members.filter(col("bucket") < 80).select(col("tkey")).distinct()
    val tshTrain = t.join(trainKeys, Seq("tkey"), "left_semi")
      .groupBy(col("tkey")).agg(first(col("text")).as("text"))
      .select(col("tkey"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("tkey"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2))))).as("shingle"))
    // map-only probe of the distinct train vocabulary: an absent word_idx
    // means no bit set, so the inner broadcast join doubles as the filter
    val b1 = words.select(col("word_idx").as("w1"), col("word").as("wd1"))
    val b2 = words.select(col("word_idx").as("w2"), col("word").as("wd2"))
    val survivors = tshTrain.select(col("shingle")).distinct()
      .select(col("shingle"), bloomP1(col("shingle")).as("p1"),
        bloomP2(col("shingle")).as("p2"))
      .join(broadcast(b1), shiftright(col("p1"), 6) === col("w1"))
      .filter(expr("(wd1 & shiftleft(CAST(1 AS BIGINT), CAST(p1 % 64 AS INT))) != 0"))
      .join(broadcast(b2), shiftright(col("p2"), 6) === col("w2"))
      .filter(expr("(wd2 & shiftleft(CAST(1 AS BIGINT), CAST(p2 % 64 AS INT))) != 0"))
      .select(col("shingle"))
    // exact verify: false positives die here; false negatives don't exist
    val shared = testSh.join(survivors, Seq("shingle"), "left_semi")
    // per-doc totals ride the store's doc-attributed rows (same values as
    // the old per-distinct-text computation fanned out through tkey: the
    // store shingles with the same array_distinct builder, and docs with
    // <3 tokens have no store rows, so the inner totals join drops them
    // exactly as before)
    val totalsD = evalDocSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val sharedD = evalDocSh.join(shared, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    totalsD
      .join(sharedD, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast(DoubleType)
          / col("n_shingles").cast(DoubleType)).as("contamination"))
  }

  // --- q_decontaminate: eval-leak SPAN REMOVAL from the train split ------
  // The rewrite counterpart of q_contamination's report (the q_block_dedup
  // → q_block_rewrite move): the open decontamination convention (Brown
  // et al. 2020 removed leaked 13-gram windows from training data; this
  // suite's shingle width is 3) — a train document keeps every token
  // EXCEPT those covered by some 3-gram that also appears anywhere in the
  // eval split. Output is the cleaned train corpus itself (doc_id,
  // n_toks, n_removed, clean_text), hash-gated, so the rewrite — not
  // just a leak count — is verified cross-engine.
  //
  // Scale shape: the eval shingle vocabulary is the bounded side
  // (q_contamination_bloom's own argument), so the leak join is
  // train-shingles × a broadcastable distinct set; leaked POSITIONS fold
  // to one sorted array per distinct text, and the rewrite is a pure
  // per-row HOF (filter positions, re-join tokens) — no second corpus
  // shuffle. Single-pass semantics, documented: re-joining tokens across
  // a removed gap can CREATE a new shingle (".. x [leak] z .." → "x .. z");
  // the standard practice ships the single pass, and the spec pins that
  // no ORIGINAL-position leaked shingle survives.
  /** The 3-gram shingle set of `docs` (doc_id, text) — the eval-side
    * vocabulary builder, shared by the inline lane and the persisted
    * [[EvalIndex]] store so "what counts as a leak" is one definition. */
  private[operators] def evalShinglesOf(docs: DataFrame): DataFrame =
    evalDocShinglesOf(docs).select(col("shingle")).distinct()

  /** The doc-ATTRIBUTED eval shingles (doc_id, shingle) — one builder
    * body with [[evalShinglesOf]], so "what counts as a leak" cannot
    * drift; the attribution is what lets [[EvalIndex]] delete an eval
    * doc without losing shingles other eval docs still carry. */
  private[operators] def evalDocShinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2))))).as("shingle"))

  /** Span-removal body: clean `docs` (doc_id, text) against an eval
    * shingle vocabulary — (doc_id, n_toks, n_removed, clean_text).
    * Shared by the inline lane (vocabulary from the corpus's own test
    * split), the indexed lane (vocabulary from the persisted
    * [[EvalIndex]]), and the at-ingest stream, so all three are one
    * algorithm. Dedup-first: positions and rewrites compute once per
    * DISTINCT text and expand through the narrow tkey join. */
  private[graft] def cleanAgainst(docs: DataFrame, evalSh: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val tw = t.groupBy(col("tkey")).agg(first(col("text")).as("text"))
      .select(col("tkey"), split(trim(col("text")), " ").as("w"))
    // leaked shingle START positions per distinct text
    val hits = tw.filter(size(col("w")) >= 3)
      .select(col("tkey"), explode(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => struct(i.as("i"), concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2)).as("shingle"))))
        .as("p"))
      .select(col("tkey"), col("p.i").as("i"), col("p.shingle").as("shingle"))
      .join(evalSh, "shingle")
      .groupBy(col("tkey")).agg(sort_array(collect_set(col("i"))).as("hs"))
    val cleaned = tw.join(hits, Seq("tkey"), "left")
      .withColumn("hs", coalesce(col("hs"), expr("CAST(array() AS array<int>)")))
      .withColumn("kept", expr(
        "filter(sequence(1, size(w)), p -> NOT exists(hs, h -> h <= p AND p <= h + 2))"))
      .select(col("tkey"),
        size(col("w")).cast(LongType).as("n_toks"),
        (size(col("w")) - size(col("kept"))).cast(LongType).as("n_removed"),
        expr("concat_ws(' ', transform(kept, p -> element_at(w, p)))").as("clean_text"))
    t.select(col("doc_id"), col("tkey")).join(cleaned, "tkey")
      .select(col("doc_id"), col("n_toks"), col("n_removed"), col("clean_text"))
  }

  /** Fixed pass budget of the fixpoint decontamination lane — unrolled
    * identically in the DuckDB oracle, so it hash-gates. The gate
    * corpora's tiny synthetic vocabulary is the CASCADE worst case
    * (most 3-grams are eval shingles, so every removal re-joins into
    * fresh leaks): measured fixpoint depth is 5 (sf0.001) and 6
    * (sf0.01) passes; 8 leaves headroom, and the spec pins budget ≡
    * budget+1 so a corpus that outruns it would fail loudly. */
  private[operators] val DecontamPasses = 8

  /** Iterated span removal: [[cleanAgainst]] documents that gap
    * re-joining can CREATE new leaked shingles (removing "a b c" from
    * "a b a b c c" re-joins the survivors into a fresh "a b c") — the
    * single-pass lane is honest about its one-pass semantics; this lane
    * re-cleans the cleaned text for a FIXED budget of passes. Each pass
    * either removes ≥ 1 token or is the fixpoint, so the budget bounds
    * work while the spec pins convergence on the gate corpus (pass 3 ≡
    * pass 4, and no eval shingle survives). `n_toks` counts the ORIGINAL
    * tokens; `n_removed` the total across passes. */
  private[graft] def cleanToFixpoint(
      docs: DataFrame, evalSh: DataFrame, passes: Int = DecontamPasses): DataFrame = {
    val orig = docs.select(col("doc_id"),
      size(split(trim(col("text")), " ")).cast(LongType).as("n_toks"))
    // DELTA ITERATION, bit-identical to the oracle's full 8-pass unroll:
    // cleaning is a per-text pure function of (text, evalSh), so a doc
    // whose pass removed ZERO tokens is at ITS fixpoint — every further
    // budgeted pass is the identity for it. Each pass therefore re-cleans
    // only the docs the previous pass CHANGED (pass 1 = full corpus;
    // the changed set decays geometrically — measured depth at the gate
    // SFs is 5-6, with passes 2+ touching only the contaminated tail),
    // and stabilized docs park in `settled`. The unrolled oracle applies
    // all 8 passes to every doc; the skipped ones are identities, so the
    // gate hash is unaffected.
    //
    // localCheckpoint cuts the lineage between passes: each pass is a
    // join/window subplan, and 8 of them NESTED make Catalyst's
    // optimization of the composed tree blow up super-linearly (the
    // standard iterative-algorithm hazard — connectedComponents does
    // the same).
    var cur = docs.select(col("doc_id"), col("text"))
    val settled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var remaining = passes
    while (remaining > 0 && cur != null) {
      val next = cleanAgainst(cur, evalSh)
        .select(col("doc_id"), col("n_removed"), col("clean_text").as("text"))
        .localCheckpoint()
      settled += next.filter(col("n_removed") === 0L)
        .select(col("doc_id"), col("text"))
      val changed = next.filter(col("n_removed") > 0L)
        .select(col("doc_id"), col("text"))
      cur = if (changed.isEmpty) null else changed
      remaining -= 1
    }
    // docs still changing when the budget ran out keep their pass-N text,
    // exactly like the unrolled loop
    val finalTexts = (settled.toSeq ++ Option(cur).toSeq)
      .reduce(_.unionByName(_))
    orig.join(finalTexts, "doc_id")
      .select(col("doc_id"), col("n_toks"),
        (col("n_toks") - when(col("text") === "", 0L)
          .otherwise(size(split(col("text"), " ")).cast(LongType))).as("n_removed"),
        col("text").as("clean_text"))
  }

  private def qDecontaminateFixpoint(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    cleanToFixpoint(
      d.filter(splitBucket < 80).select(col("doc_id"), col("text")),
      evalShinglesOf(d.filter(splitBucket >= 90).select(col("doc_id"), col("text"))))
  }

  private val qDecontaminateFixpointSql = {
    // one cleaning pass as a CTE pair over a (doc_id, tx) relation; the
    // kept tokens round-trip through a string join/split exactly like the
    // Spark lane, so a fully-cleaned doc is [''] on both engines
    def pass(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT d.doc_id,
         |    COALESCE(array_to_string(
         |      [d.w[p] FOR p IN range(1, len(d.w) + 1)
         |        IF len(list_filter(COALESCE(h.hs, []),
         |          x -> x <= p AND p <= x + 2)) = 0], ' '), '') AS tx
         |  FROM (SELECT doc_id, string_split(tx, ' ') AS w FROM $prev) d
         |  LEFT JOIN (
         |    SELECT doc_id, list(i ORDER BY i) AS hs FROM (
         |      SELECT d2.doc_id, r.i
         |      FROM (SELECT doc_id, string_split(tx, ' ') AS w FROM $prev) d2,
         |           UNNEST(range(1, len(d2.w) - 1)) AS r(i)
         |      WHERE len(d2.w) >= 3
         |        AND (d2.w[r.i] || ' ' || d2.w[r.i+1] || ' ' || d2.w[r.i+2])
         |          IN (SELECT shingle FROM test_sh)) x
         |    GROUP BY 1) h USING (doc_id))""".stripMargin
    val passes = (1 to DecontamPasses)
      .map(k => pass(s"tr${k - 1}", s"tr$k")).mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
       |    trim(text) AS tx
       |  FROM documents),
       |test_sh AS (
       |  SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       |  FROM (SELECT string_split(tx, ' ') AS w FROM t WHERE bucket >= 90) s,
       |       UNNEST(range(1, len(w) - 1)) AS r(i)
       |  WHERE len(w) >= 3),
       |tr0 AS (SELECT doc_id, tx FROM t WHERE bucket < 80),
       |$passes
       |SELECT f.doc_id,
       |  len(string_split(o.tx, ' '))::BIGINT AS n_toks,
       |  (len(string_split(o.tx, ' '))
       |    - CASE WHEN f.tx = '' THEN 0 ELSE len(string_split(f.tx, ' ')) END)::BIGINT
       |    AS n_removed,
       |  f.tx AS clean_text
       |FROM tr$DecontamPasses f JOIN tr0 o USING (doc_id)""".stripMargin
  }

  private[operators] def splitBucket =
    pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))

  private def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    cleanAgainst(
      d.filter(splitBucket < 80).select(col("doc_id"), col("text")),
      evalShinglesOf(d.filter(splitBucket >= 90).select(col("doc_id"), col("text"))))
  }

  /** Exposed to [[EvalIndex]]: the persisted-vocabulary lane is
    * row-identical and rides this oracle unchanged. */
  private[operators] def qDecontaminateOracle: String = qDecontaminateSql

  private val qDecontaminateSql =
    """WITH t AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
      |    string_split(trim(text), ' ') AS w
      |  FROM documents),
      |test_sh AS (
      |  SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM t, UNNEST(range(1, len(w) - 1)) AS r(i)
      |  WHERE bucket >= 90 AND len(w) >= 3),
      |train AS (SELECT doc_id, w FROM t WHERE bucket < 80),
      |hits AS (
      |  SELECT doc_id, list(i ORDER BY i) AS hs FROM (
      |    SELECT tr.doc_id, r.i
      |    FROM train tr, UNNEST(range(1, len(tr.w) - 1)) AS r(i)
      |    WHERE len(tr.w) >= 3
      |      AND (tr.w[r.i] || ' ' || tr.w[r.i+1] || ' ' || tr.w[r.i+2])
      |        IN (SELECT shingle FROM test_sh))
      |  GROUP BY 1)
      |SELECT doc_id, n_toks, n_toks - len(kept) AS n_removed,
      |  COALESCE(array_to_string(kept, ' '), '') AS clean_text
      |FROM (
      |  SELECT tr.doc_id, len(tr.w)::BIGINT AS n_toks,
      |    [tr.w[p] FOR p IN range(1, len(tr.w) + 1)
      |      IF len(list_filter(COALESCE(h.hs, []),
      |        x -> x <= p AND p <= x + 2)) = 0] AS kept
      |  FROM train tr LEFT JOIN hits h USING (doc_id)) c""".stripMargin

  // --- q_dsir_vote: DSIR-shaped data selection via hashed-feature voting -
  // Importance-resampling selection in the shape of DSIR (Xie et al. 2023,
  // "Data Selection for Language Models via Importance Resampling"):
  // featurize documents as HASHED unigram buckets (fixed feature space,
  // independent of vocabulary growth), estimate a target distribution
  // (here: the 'en' slice) and the raw corpus distribution over those
  // buckets, and score every document by how target-like its features
  // are. DSIR's Σ log(p_target(f)/p_raw(f)) is replaced by the
  // rank-shaped integer vote Σ sign(c_t[f]·N_r − c_r[f]·N_t) — the same
  // cross-multiplication move the lm-bigram family uses to stay off
  // float summation, so the whole selection signal is integer-exact and
  // rides the full hash gate. Scale shape: one wordcount-shaped agg to
  // bucket stats (bounded by DsirBuckets), the per-word bucket hash
  // computed once per DISTINCT word, votes broadcast back to the token
  // table; the only corpus-sized shuffle is the token wordcount itself.
  // Overflow bound: c·N ≤ (corpus tokens)² — 5e8 tokens at sf10 keeps
  // products < 2.5e17, inside BIGINT for both engines.
  private val DsirBuckets = 512L
  private val DsirTargetLang = "en"

  /** Portable per-string hash: left fold (acc*31 + ascii(c)) mod P — the
    * PolyMinHash base family, computed compositionally (per DISTINCT word
    * only, so the interpreted HOF cost is vocabulary-bounded). */
  private def polyWordHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % graft.functions.PolyMinHash.P)

  /** Hashed-bucket distribution counters of a (text, lang) frame —
    * (b, c_t, c_r), the DSIR model tables. Shared by the inline lane and
    * the persisted [[DsirIndex]] store, so the distribution estimate
    * cannot drift between them. Dedup-first (the classifier-family
    * discipline): statistics explode once per DISTINCT (text, lang) with
    * copy weights, so each document INSTANCE in the frame counts once —
    * which is exactly what makes the counters additive across disjoint
    * document batches (append ≡ rebuild by integer addition). */
  private[operators] def dsirBucketStats(docs: DataFrame): DataFrame = {
    val tl = docs.groupBy(col("text"), col("lang")).agg(count(lit(1)).as("n_copies"))
      .select(col("n_copies"), col("lang"),
        explode(split(trim(col("text")), " ")).as("word"))
    val wb = tl.select(col("word")).distinct()
      .select(col("word"), pmod(polyWordHash(col("word")), lit(DsirBuckets)).as("b"))
    tl.join(wb, "word")
      .groupBy(col("b"))
      .agg(
        sum(when(col("lang") === DsirTargetLang, col("n_copies")).otherwise(0L)).as("c_t"),
        sum(col("n_copies")).as("c_r"))
  }

  /** Score (doc_id, text) docs against bucket counters (b, c_t, c_r) —
    * the q_dsir_vote output shape. The word→bucket map is a pure hash,
    * so the serve path recomputes it from the scored docs' OWN
    * vocabulary (no stored vocabulary needed — the fixed feature space
    * is the point of hashed features); the per-document score is
    * computed once per DISTINCT text and attributed through the narrow
    * tkey join. Shared by the inline and indexed lanes. */
  private[operators] def dsirScoreAgainst(docs: DataFrame, bs: DataFrame): DataFrame = {
    val tot = bs.agg(sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"))
    val votes = bs.crossJoin(broadcast(tot))
      .select(col("b"),
        when(col("c_t") * col("n_r") > col("c_r") * col("n_t"), 1L)
          .when(col("c_t") * col("n_r") < col("c_r") * col("n_t"), -1L)
          .otherwise(0L).as("vote"))
    val tw = docs.select(col("text")).distinct()
      .select(xxhash64(col("text")).as("tkey"),
        explode(split(trim(col("text")), " ")).as("word"))
    val wb = tw.select(col("word")).distinct()
      .select(col("word"), pmod(polyWordHash(col("word")), lit(DsirBuckets)).as("b"))
    // LEFT join to the votes: a word hashing to a bucket absent from the
    // persisted distribution (possible only in the DsirIndex serving
    // path, on out-of-distribution docs) still counts toward n_tokens
    // with a NEUTRAL vote — an inner join silently dropped it, making
    // n_tokens diverge from the doc's true token count
    val perText = tw
      .join(broadcast(wb), "word").join(broadcast(votes), Seq("b"), "left")
      .groupBy(col("tkey"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("vote"), lit(0L))).as("dsir_vote"))
    docs.select(col("doc_id"), xxhash64(col("text")).as("tkey"))
      .join(perText, "tkey")
      .select(col("doc_id"), col("n_tokens"), col("dsir_vote"))
  }

  private def qDsirVote(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    dsirScoreAgainst(
      d.select(col("doc_id"), col("text")),
      dsirBucketStats(d.select(col("text"), col("lang"))))
  }

  /** Exposed to [[DsirIndex]]: the persisted-distribution lane is
    * row-identical and rides this oracle unchanged. */
  private[operators] def qDsirVoteOracle: String = qDsirVoteSql

  private val qDsirVoteSql = {
    val ph = s"list_reduce(list_prepend(0::BIGINT, [ascii(substring(word, i, 1))::BIGINT FOR i IN range(1, length(word)+1)]), (acc, c) -> (acc*31 + c) % ${graft.functions.PolyMinHash.P})"
    s"""WITH tok AS (
       |  SELECT doc_id, lang, w[i] AS word
       |  FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w
       |        FROM documents) t,
       |       UNNEST(range(1, len(w) + 1)) AS r(i)),
       |wb AS (
       |  SELECT word, $ph % $DsirBuckets AS b
       |  FROM (SELECT DISTINCT word FROM tok) dw),
       |bs AS (
       |  SELECT b,
       |    CAST(SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
       |    CAST(COUNT(*) AS BIGINT) AS c_r
       |  FROM tok JOIN wb USING (word) GROUP BY b),
       |tot AS (
       |  SELECT CAST(SUM(c_t) AS BIGINT) AS n_t, CAST(SUM(c_r) AS BIGINT) AS n_r
       |  FROM bs),
       |votes AS (
       |  SELECT b, CASE WHEN c_t * n_r > c_r * n_t THEN 1
       |                 WHEN c_t * n_r < c_r * n_t THEN -1
       |                 ELSE 0 END AS vote
       |  FROM bs, tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(vote) AS BIGINT) AS dsir_vote
       |FROM tok JOIN wb USING (word) JOIN votes USING (b)
       |GROUP BY doc_id""".stripMargin
  }

  // --- q_repetition: Gopher-style repetition quality filters -------------
  // The repetition signals real curation pipelines gate on (Rae et al.
  // 2021 §A1.1): most-frequent-token fraction and duplicate n-gram
  // fractions. Single scan, NO shuffle, linear at 100 TB. The six integer
  // counters come from ONE codegen'd pass over the document
  // (`RepetitionStatsExpr` — the composed HOF formulation costs ~100 µs
  // per doc interpreted; parity asserted in NativeVsComposedSpec); the
  // fractions stay Column arithmetic, so the oracle SQL is independent of
  // the native expression.
  private def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val st = col("st")
    val n = element_at(st, 1)
    def dupFrac(dIdx: Int, tIdx: Int): Column = {
      val (d, t) = (element_at(st, dIdx), element_at(st, tIdx))
      // the composed `when(size >= g+1)` guard: total is reported 0 then
      when(t > 0, lit(1.0) - d.cast(DoubleType) / t.cast(DoubleType))
        .otherwise(0.0)
    }
    table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.RepetitionStats.stats(col("text")).as("st"))
      .select(col("doc_id"), n.as("n_tokens"),
        (element_at(st, 2).cast(DoubleType) / n.cast(DoubleType)).as("max_tok_frac"),
        dupFrac(3, 4).as("dup_2gram_frac"),
        dupFrac(5, 6).as("dup_3gram_frac"))
      .withColumn("repetitive",
        col("max_tok_frac") > 0.2 || col("dup_3gram_frac") > 0.3)
  }

  private val qRepetitionSql = {
    val w = "string_split(trim(text), ' ')"
    def dupFrac(gram: Int) = {
      val g = (0 until gram).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""CASE WHEN len(w) >= ${gram + 1} THEN
         |  1.0 - len(list_distinct([$g FOR i IN range(1, len(w) - ${gram - 2})]))::DOUBLE
         |    / len([$g FOR i IN range(1, len(w) - ${gram - 2})])
         |  ELSE 0.0 END""".stripMargin
    }
    val maxTok = "list_max([len(list_filter(w, x -> x = t))::BIGINT FOR t IN list_distinct(w)])"
    s"""SELECT doc_id, len(w)::BIGINT AS n_tokens,
       |  $maxTok::DOUBLE / len(w) AS max_tok_frac,
       |  ${dupFrac(2)} AS dup_2gram_frac,
       |  ${dupFrac(3)} AS dup_3gram_frac,
       |  ($maxTok::DOUBLE / len(w)) > 0.2 OR (${dupFrac(3)}) > 0.3 AS repetitive
       |FROM (SELECT doc_id, $w AS w FROM documents) t""".stripMargin
  }

  // --- q_stratified_sample: deterministic per-stratum sampling -----------
  // Mixture construction: a reproducible N-per-language sample, ranked by
  // the multiplicative hash of the stable doc_id (order/partitioning/
  // engine-independent — same family as q_train_split). Spark plans the
  // rank-filter as WindowGroupLimit: each task keeps only its local top-N
  // per stratum BEFORE the exchange, so the shuffle moves ≤ N·tasks rows
  // per stratum, not the corpus — the scale-correct shape even though a
  // handful of language strata would otherwise skew.
  private val SamplePerStratum = 20

  private def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("sample_rank", row_number().over(w).cast(LongType))
      .filter(col("sample_rank") <= SamplePerStratum)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
  }

  private val qStratifiedSampleSql =
    s"""SELECT lang, doc_id, sample_rank
       |FROM (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS sample_rank
       |  FROM documents) t
       |WHERE sample_rank <= $SamplePerStratum""".stripMargin

  // --- q_tfidf: per-document top-k TF-IDF keywords -----------------------
  // tf from one wordcount-shaped agg; df is vocabulary-bounded (planner
  // broadcasts it); the corpus doc count joins as a 1-row broadcast. The
  // score is tf·N/df — (tf·N) stays integer-exact, ONE double division,
  // so both engines rank identically (a float ln() idf would differ in
  // the last ulp between libm implementations; ranking by tf·N/df is
  // order-equivalent to tf/df and oracle-safe). Top-3 per doc plans as
  // WindowGroupLimit (map-side partial top-k).
  private val TfIdfK = 3

  private def qTfIdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Exact-dedup first (the DedupOps move): tf, df, score and rank are
    // functions of the TEXT, so the term explode, both aggregations and
    // the top-k window run once per DISTINCT text; per-doc rows expand by
    // one output-sized join at the end. Doc-level df == copy-weighted df
    // over distinct texts; n_docs == Σ copies. Oracle untouched.
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val members = docs.select(col("doc_id"), col("tkey"))
    val groups = docs.groupBy(col("tkey"))
      .agg(count(lit(1)).as("n_copies"), first(col("text")).as("text"))
      .cache()
    val tf = groups
      .select(col("tkey"), col("n_copies"),
        explode(split(trim(col("text")), " ")).as("term"))
      .groupBy(col("tkey"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("n_copies")).as("n_copies"))
      .cache()
    val df = tf.groupBy(col("term")).agg(sum(col("n_copies")).as("df"))
    val nDocs = groups.agg(sum(col("n_copies")).as("n_docs"))
    val w = Window.partitionBy(col("tkey")).orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(nDocs)
      .select(col("tkey"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast(DoubleType) / col("df").cast(DoubleType)).as("score"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= TfIdfK)
      .join(members, "tkey")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  private val qTfIdfSql =
    s"""WITH tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
       |        FROM documents) t
       |  GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf)
       |SELECT doc_id, term, tf, df, score, rank FROM (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    (tf.tf * n.n_docs)::DOUBLE / df.df AS score,
       |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY (tf.tf * n.n_docs)::DOUBLE / df.df DESC, tf.term) AS rank
       |  FROM tf JOIN df USING (term) CROSS JOIN n) s
       |WHERE rank <= $TfIdfK""".stripMargin

  // --- q_token_budget: per-source token-budget sampling ------------------
  // Mixture construction by TOKEN budget, not doc count: per source, take
  // documents in deterministic hash order until the running token total
  // exceeds the budget. The SPEC (and the oracle) is the naive running
  // sum over the full stratum — but a single window per source would
  // funnel each stratum through one reducer at 100 TB, so the
  // implementation is the two-phase prefix-sum: (1) aggregate token
  // totals per hash-order BUCKET (1024 per stratum — a tiny table), take
  // the exclusive running prefix over buckets; (2) an exact window only
  // WITHIN each (source, bucket) partition — balanced, 1024-way parallel
  // per stratum — and each doc's global cumsum = bucket prefix + local
  // cumsum. Identical output to the naive window, shuffle partitioned by
  // (source, bucket).
  // ~55-70% of each stratum's total at the test SFs — the cutoff bites
  private val TokenBudget = 800L

  private def qTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val docs = table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), h.as("h"),
        size(split(trim(col("text")), " ")).cast(LongType).as("toks"))
      .withColumn("bucket", shiftright(col("h"), 22)) // = h div (2^32/1024), order-preserving
    val bucketTotals = docs.groupBy(col("source"), col("bucket"))
      .agg(sum(col("toks")).as("btoks"))
    val wB = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = bucketTotals
      .withColumn("prefix", coalesce(sum(col("btoks")).over(wB), lit(0L)))
      .select(col("source"), col("bucket"), col("prefix"))
    val wIn = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(prefixes), Seq("source", "bucket"))
      .withColumn("cum_toks", col("prefix") + sum(col("toks")).over(wIn))
      .filter(col("cum_toks") <= TokenBudget)
      .select(col("source"), col("doc_id"), col("toks"), col("cum_toks"))
  }

  // the oracle is the naive spec: one running sum per stratum
  private val qTokenBudgetSql =
    s"""SELECT source, doc_id, toks, cum_toks FROM (
       |  SELECT source, doc_id, toks,
       |    CAST(SUM(toks) OVER (PARTITION BY source
       |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
       |  FROM (SELECT source, doc_id,
       |          len(string_split(trim(text), ' '))::BIGINT AS toks
       |        FROM documents) d) t
       |WHERE cum_toks <= $TokenBudget""".stripMargin

  // --- q_weighted_sample: quality-weighted deterministic sampling --------
  // Mixture construction where inclusion probability ∝ quality: keep a
  // document iff u < weight·rate, with u = docHash/2³² the deterministic
  // uniform draw (the q_train_split family — reproducible across runs,
  // partitionings and engines) and weight = the q_text_stats quality
  // score. Every value is a fixed tree of exactly-rounded IEEE doubles —
  // no reassociation, no libm — so the kept set is engine-identical.
  // Single scan, no shuffle.
  private val SampleRate = 0.5

  private def qWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = toks
    val nTokens = size(w).cast(LongType)
    val nStop = sumOver(w, t => when(t.isin(Stopwords: _*), 1L).otherwise(0L))
    val quality = least(lit(1.0), nTokens.cast(DoubleType) / 100.0) *
      (lit(1.0) - nStop.cast(DoubleType) / nTokens.cast(DoubleType))
    val u = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
      .cast(DoubleType) / 4294967296.0
    table(spark, dir, "documents")
      .select(col("doc_id"), u.as("u"), quality.as("weight"))
      .filter(col("u") < col("weight") * SampleRate)
  }

  private val qWeightedSampleSql = {
    val stop = Stopwords.map("'" + _ + "'").mkString(",")
    val nStop = s"list_reduce(list_prepend(0::BIGINT, [CASE WHEN t IN ($stop) THEN 1::BIGINT ELSE 0::BIGINT END FOR t IN string_split(trim(text), ' ')]), (a,x) -> a+x)"
    val nTok = "len(string_split(trim(text), ' '))"
    s"""SELECT doc_id, u, weight FROM (
       |  SELECT doc_id,
       |    ((doc_id * 2654435761) % 4294967296)::DOUBLE / 4294967296 AS u,
       |    least(1.0, $nTok / 100.0) * (1.0 - $nStop::DOUBLE / $nTok) AS weight
       |  FROM documents) t
       |WHERE u < weight * $SampleRate""".stripMargin
  }

  // --- q_dup_by_source: per-source duplication report --------------------
  // The curation dashboard number: how much of each source is exact-dup
  // content (docs whose text occurs more than once corpus-wide). One
  // text-keyed agg for copy counts + one source-keyed rollup; the join
  // back to docs is narrow (tkey, is_dup). The 100 TB shape is the exact
  // dedup pass itself — this is its per-source attribution.
  private def qDupBySource(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("source"), xxhash64(col("text")).as("tkey"))
    val copies = d.groupBy(col("tkey")).agg(count(lit(1)).as("n_copies"))
    d.join(copies, "tkey")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") >= 2, 1L).otherwise(0L)).as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        (col("n_dup_docs").cast(DoubleType)
          / col("n_docs").cast(DoubleType)).as("dup_frac"))
  }

  private val qDupBySourceSql =
    """WITH copies AS (
      |  SELECT text, COUNT(*) AS n_copies FROM documents GROUP BY text),
      |j AS (
      |  SELECT d.source, c.n_copies FROM documents d JOIN copies c USING (text))
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
      |  SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)::DOUBLE
      |    AS dup_frac
      |FROM j GROUP BY source""".stripMargin

  // --- q_mixture_rebalance: per-source sampling rates for a uniform mix --
  // Mixture balancing the way a training-data pipeline plans it: given a
  // uniform target share per source, compute each source's token count,
  // the integer per-source token budget (T div k), and the keep-rate
  // min(1, budget/tokens) a downstream deterministic sampler would apply.
  // Everything except the final single division stays in BIGINT.
  // Complements q_token_budget (quality-ranked cutoff inside one budget)
  // and q_stratified_sample (fixed per-stratum rate).
  private def qMixtureRebalance(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("source"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_tok"))
    val perSource = toks.groupBy(col("source")).agg(sum(col("n_tok")).as("tokens"))
    val totals = perSource.agg(
      sum(col("tokens")).as("total"), count(lit(1)).as("k"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("tokens"),
        expr("total div k").as("target_tokens"))
      .select(col("source"), col("tokens"), col("target_tokens"),
        least(lit(1.0), col("target_tokens").cast(DoubleType)
          / col("tokens").cast(DoubleType)).as("keep_rate"))
  }

  // --- q_temperature_mix: temperature-based mixture reweighting ----------
  // The multilingual/multi-source sampling scheme (α-temperature scaling,
  // the mT5/XLM-R convention): source i's sampling weight ∝ p_i^α, which
  // up-weights small sources relative to proportional sampling. α = 1/2
  // keeps it INTEGER-EXACT across engines: w_i = ⌊√tokens_i⌋ (IEEE sqrt
  // is correctly rounded in both engines, so the floor is deterministic;
  // no float pow, no cross-engine Σ-order hazard — all downstream
  // arithmetic is BIGINT), target_i = total·w_i div Σw, and the keep/
  // upsample factor in fixed-point permille. Same one-aggregate shape as
  // q_mixture_rebalance — a k-row broadcast plan at any corpus size.
  private def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("source"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_tok"))
    val perSource = toks.groupBy(col("source")).agg(sum(col("n_tok")).as("tokens"))
      .withColumn("w", floor(sqrt(col("tokens").cast(DoubleType))).cast(LongType))
    val totals = perSource.agg(
      sum(col("tokens")).as("total"), sum(col("w")).as("sum_w"))
    // reduce before multiplying: total·w can pass 2^63 at 100 TB scale
    // (total≈2.5e13 tokens × w≈5e6), where Spark would wrap silently and
    // DuckDB would error; w·(total div Σw) + (w·(total mod Σw)) div Σw is
    // the same integer for non-negative operands with every intermediate
    // bounded by max(total, w·Σw)
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("tokens"), col("w"),
        expr("w * (total div sum_w) + (w * (total % sum_w)) div sum_w")
          .as("target_tokens"))
      .withColumn("sample_permille",
        expr("(target_tokens * 1000) div tokens"))
  }

  private val qTemperatureMixSql =
    """WITH toks AS (
      |  SELECT source, len(string_split(trim(text), ' ')) AS n_tok FROM documents),
      |per AS (
      |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |    CAST(floor(sqrt(CAST(SUM(n_tok) AS BIGINT))) AS BIGINT) AS w
      |  FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
      |               CAST(SUM(w) AS BIGINT) AS sum_w FROM per)
      |SELECT source, tokens, w,
      |  w * (total // sum_w) + (w * (total % sum_w)) // sum_w AS target_tokens,
      |  ((w * (total // sum_w) + (w * (total % sum_w)) // sum_w) * 1000)
      |    // tokens AS sample_permille
      |FROM per, tot""".stripMargin

  private val qMixtureRebalanceSql =
    """WITH toks AS (
      |  SELECT source, len(string_split(trim(text), ' ')) AS n_tok FROM documents),
      |per AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per)
      |SELECT source, tokens, total // k AS target_tokens,
      |  least(1.0, (total // k)::DOUBLE / tokens::DOUBLE) AS keep_rate
      |FROM per, tot""".stripMargin

  // --- q_redact: PII detection + redaction -------------------------------
  // The scrubbing pass every training-data pipeline runs before anything
  // else: find emails / phone numbers / IPv4s, count them, and rewrite the
  // text with typed placeholders. Pure per-row regex work — no shuffle, a
  // single scan, whole-stage codegen — the 100 TB shape. Patterns stay in
  // the RE2 ∩ java.util.regex common subset (character classes, bounded
  // repetition, \b; no lookaround/backrefs) so Spark and the DuckDB oracle
  // match byte-for-byte; replacement order is fixed (email → phone → IP)
  // and each stage replaces ALL occurrences (DuckDB needs the 'g' flag —
  // its regexp_replace is first-match by default, Spark's is global).
  //
  // The synthetic corpus carries no natural PII, so — like the census's
  // derived columns — deterministic PII is appended to a doc_id-keyed
  // subset first; the operator's value is the redaction machinery, and
  // the fixture makes every pattern + the no-PII case POSITIVELY
  // exercised at every SF.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private def qRedact(spark: SparkSession, dir: String): DataFrame = {
    // 6 regex passes over full text per row, all pre-shuffle — map-bound
    // (Tables.fanOut: one row group = one core without it)
    val d = graft.Tables.fanOut(table(spark, dir, "documents"))
    val pii = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast(StringType),
          lit("@example.com asap")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") * 7 % 1000).cast(StringType), 3, "0"), lit("-"),
          lpad((col("doc_id") * 13 % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast(StringType),
          lit("."), (col("doc_id") * 3 % 256).cast(StringType)))
        .otherwise(lit("")))
    d.select(col("doc_id"), pii.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast(LongType)
          .as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast(LongType)
          .as("n_phones"),
        size(regexp_extract_all(col("t"), lit(Ipv4Re), lit(0))).cast(LongType)
          .as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>").as("redacted"))
  }

  private val qRedactSql = {
    // single-quoted SQL literals: backslashes pass through verbatim
    val (email, phone, ip) = (EmailRe, PhoneRe, Ipv4Re)
    s"""WITH pii AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN ' contact user' || doc_id || '@example.com asap' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
       |           || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0
       |         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       |           || '.' || CAST(doc_id * 3 % 256 AS VARCHAR) ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_emails,
       |  len(regexp_extract_all(t, '$phone')) AS n_phones,
       |  len(regexp_extract_all(t, '$ip')) AS n_ips,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |      '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g') AS redacted
       |FROM pii""".stripMargin
  }

  // --- q_lm_bigram: bigram-LM corpus-fit scoring (CCNet-shaped) ----------
  // The LM-quality-filter shape: train n-gram statistics ON the corpus
  // (one wordcount-shaped agg over bigrams, one over their prefixes), then
  // score every document by how well the model predicts it. To stay on
  // the hash gate the score is kept rank-equivalent and integer-exact:
  // per-doc Σc(w1,w2) and Σc(w1) are BIGINTs and fit_score is their ONE
  // double division (the tf·N/df move from q_tfidf — a float Σlog p would
  // differ between libm implementations; swapping log-probs in off-gate
  // is a per-row transform). n_hapax (bigrams seen once corpus-wide) is
  // the rare-sequence signal CCNet uses perplexity for. Dedup-first: all
  // per-text work runs once per DISTINCT text (counts copy-weighted, ≡
  // counting over every doc), docs expand by one output-sized join.
  // Documents with <2 tokens have no bigrams and are excluded (inner
  // join) in both engines.
  private def qLmBigram(spark: SparkSession, dir: String): DataFrame =
    lmBigramOver(table(spark, dir, "documents"))

  /** The bigram-LM train+score body over an arbitrary documents frame
    * (needs doc_id, text) — shared by the dir-based lane above and the
    * sampled-sub-corpus certificate ([[graft.operators.CurationFunnel]]),
    * whose inline side trains on the SAMPLE corpus. */
  private[operators] def lmBigramOver(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), xxhash64(col("text")).as("tkey"), col("text"))
    val members = docs.select(col("doc_id"), col("tkey"))
    val w = split(trim(col("text")), " ")
    val pairs = transform(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      (x, i) => struct(
        concat_ws(" ", x, element_at(w, i + 2)).as("b"), x.as("w1")))
    val groups = docs.groupBy(col("tkey"))
      .agg(count(lit(1)).as("n_copies"), first(col("text")).as("text"))
      .select(col("tkey"), col("n_copies"), explode(pairs).as("p"))
      .select(col("tkey"), col("n_copies"),
        col("p.b").as("b"), col("p.w1").as("w1"))
      .cache()
    // copy-weighted model counts == counting over every doc incl. copies
    val cnt2 = groups.groupBy(col("b")).agg(sum(col("n_copies")).as("c12"))
    val cnt1 = groups.groupBy(col("w1")).agg(sum(col("n_copies")).as("c1"))
    val perText = groups
      .join(cnt2, "b").join(cnt1, "w1")
      .groupBy(col("tkey"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("c12")).as("sum_c12"),
        sum(col("c1")).as("sum_c1"),
        sum(when(col("c12") === 1, 1L).otherwise(0L)).as("n_hapax"))
    members.join(perText, "tkey")
      .select(col("doc_id"), col("n_bigrams"), col("sum_c12"), col("sum_c1"),
        (col("sum_c12").cast(DoubleType) / col("sum_c1").cast(DoubleType))
          .as("fit_score"),
        col("n_hapax"))
  }

  /** Shared with the persisted-model lane ([[LmIndex]]), which trains on
    * and scores the same corpus and so rides this oracle unchanged. */
  // --- q_ccnet_buckets: perplexity-bucket selection (CCNet head/middle/
  // tail) — the SELECTION step the bigram-LM score feeds in the CCNet
  // pipeline (Wenzek et al. 2020): per source, split scored documents
  // into terciles of LM fit. The scale-correct formulation: tercile
  // CUTOFF VALUES come from the deterministic bottom-k uniform sample
  // (the q_quantile_sketch move — CCNet itself thresholds on sampled
  // perplexity percentiles), so thresholds are a bounded per-source
  // computation (WindowGroupLimit keeps k per task) and the assignment is
  // a map-only broadcast comparison — never a full per-source rank sort,
  // which would funnel each source through one reducer at 100 TB.
  // Determinism: fit_score is one double division of exact BIGINT sums
  // (bit-identical in both engines, already hash-gated by q_lm_bigram);
  // thresholds are sampled order statistics at the integer ceil-ranks;
  // ties at a cutoff bucket by value comparison, identical both sides.
  private val CcK = 64

  private[operators] def qCcnetBuckets(spark: SparkSession, dir: String): DataFrame =
    ccnetBucketsOver(table(spark, dir, "documents"))

  /** Inline CCNet selection over an arbitrary documents frame: train the
    * bigram LM on `docs` (the model is corpus-level state — here the
    * corpus IS `docs`), score, tercile-select. The cached `groups` frame
    * inside [[lmBigramOver]] keeps the cuts branch from re-exploding the
    * corpus. Shared by the dir lane and the sampled certificate's
    * inline side. */
  private[operators] def ccnetBucketsOver(docs: DataFrame): DataFrame = {
    // cache the NARROW per-doc score frame: ccnetBucketsFrom references
    // the scorer in two plan branches (the ≤CcK×sources sample and the
    // final full assignment), and `lmBigramOver`'s internal cache only
    // covers the bigram explode — the model-count joins + per-text
    // aggregation were still evaluated once per branch (round 16;
    // measured 3.64 → 2.6 s at sf0.1). Narrow (doc_id, fit_score) rows,
    // intra-query only — the bench clears caches between lanes.
    val full = lmBigramOver(docs)
      .select(col("doc_id"), col("fit_score")).cache()
    ccnetBucketsFrom(docs,
      dd => full.join(dd.select(col("doc_id")), Seq("doc_id"), "left_semi"))
  }

  /** The tercile-selection body, parameterized by HOW docs are LM-scored
    * — inline training ([[qCcnetBuckets]]) vs the persisted [[LmIndex]]
    * model (`q_ccnet_buckets_indexed`, the indexed funnel, the streaming
    * funnel). fit_score is one double division of exact BIGINT sums in
    * every lane, so all twins are row-identical and ride one oracle.
    *
    * One-scoring-pass shape (round 9): the sample MEMBERSHIP depends
    * only on (h(doc_id), doc_id, source) and LM-eligibility (≥2 tokens —
    * the scoring inner-join's exclusion, a pure per-doc predicate, so it
    * needs no scores), never on the scores themselves. Ranking the
    * sample BEFORE any scoring means the cutoff path calls `score` on
    * only ≤ CcK×sources docs (a store-backed scorer then explodes only
    * the sample's texts), and the full corpus is scored exactly ONCE for
    * the final assignment — the previous shape referenced one scored
    * frame in two plan branches and evaluated the whole per-text scoring
    * pipeline twice per run (measured: q_ccnet_buckets_indexed
    * 3.75 → 2.05 s at sf0.1; a narrowing join could not help because
    * Catalyst does not push a doc_id semi-join through the per-text
    * aggregates). At 100 TB this is also the right dependency order:
    * the per-source rank window runs over narrow (doc_id, source, h)
    * rows with WindowGroupLimit, not over scored rows. `score` maps a
    * documents subset to its (doc_id, fit_score) rows. */
  private[operators] def ccnetBucketsFrom(
      docs: DataFrame, score: DataFrame => DataFrame): DataFrame = {
    val P = 1000000007L
    // LM-eligible docs: ≥2 tokens ⇔ the doc has a bigram row (the model
    // is trained on the same corpus — or its superset in the streaming
    // lane — so every observed bigram joins)
    val withH = docs
      .filter(size(split(trim(col("text")), " ")) >= 2)
      .select(col("doc_id"), col("source"))
      .withColumn("h", ((col("doc_id") % P) * 48271L + 11L) % P)
    val wS = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val sampleIds = withH.withColumn("r", row_number().over(wS)).filter(col("r") <= CcK)
      .select(col("doc_id"), col("source"), col("h"))
    val sample = sampleIds
      .join(score(docs.join(sampleIds.select(col("doc_id")), Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), col("fit_score")), "doc_id")
    val m = sample.groupBy(col("source")).agg(count(lit(1)).as("m"))
    val wV = Window.partitionBy(col("source"))
      .orderBy(col("fit_score").desc, col("h"), col("doc_id"))
    val cuts = sample.withColumn("rv", row_number().over(wV))
      .join(broadcast(m), Seq("source"))
      .groupBy(col("source"))
      .agg(
        max(when(col("rv") === expr("(m + 2) div 3"), col("fit_score"))).as("t1"),
        max(when(col("rv") === expr("(2 * m + 2) div 3"), col("fit_score"))).as("t2"))
    score(docs).select(col("doc_id"), col("fit_score"))
      .join(withH.select(col("doc_id"), col("source")), "doc_id")
      .join(broadcast(cuts), Seq("source"))
      .select(col("doc_id"), col("source"),
        when(col("fit_score") >= col("t1"), "head")
          .when(col("fit_score") >= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  private[operators] val qCcnetBucketsSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |bg AS (
       |  SELECT doc_id, w[g] || ' ' || w[g + 1] AS b, w[g] AS w1
       |  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS i(g)),
       |cnt2 AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b),
       |cnt1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
       |lm AS (
       |  SELECT doc_id, sum(c12)::DOUBLE / sum(c1) AS fit_score
       |  FROM bg JOIN cnt2 USING (b) JOIN cnt1 USING (w1)
       |  GROUP BY doc_id),
       |sc AS (
       |  SELECT d.doc_id, d.source, lm.fit_score,
       |    ((d.doc_id % 1000000007) * 48271 + 11) % 1000000007 AS h
       |  FROM documents d JOIN lm USING (doc_id)),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY source ORDER BY h, doc_id) AS r FROM sc),
       |s AS (SELECT * FROM r WHERE r <= $CcK),
       |m AS (SELECT source, COUNT(*) AS m FROM s GROUP BY 1),
       |rv AS (SELECT source, fit_score, ROW_NUMBER() OVER (
       |         PARTITION BY source ORDER BY fit_score DESC, h, doc_id) AS rv
       |       FROM s),
       |cuts AS (
       |  SELECT source,
       |    MAX(CASE WHEN rv = (m + 2) // 3 THEN fit_score END) AS t1,
       |    MAX(CASE WHEN rv = (2 * m + 2) // 3 THEN fit_score END) AS t2
       |  FROM rv JOIN m USING (source) GROUP BY source)
       |SELECT sc.doc_id, sc.source,
       |  CASE WHEN sc.fit_score >= cuts.t1 THEN 'head'
       |       WHEN sc.fit_score >= cuts.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM sc JOIN cuts USING (source)""".stripMargin

  private[operators] def qLmBigramOracle: String = qLmBigramSql

  /** The CCNet-selection oracle, shared with the persisted-model lane
    * ([[LmIndex]] `q_ccnet_buckets_indexed`). */
  private[operators] def qCcnetBucketsOracle: String = qCcnetBucketsSql

  private val qLmBigramSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |bg AS (
       |  SELECT doc_id, w[g] || ' ' || w[g + 1] AS b, w[g] AS w1
       |  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS i(g)),
       |cnt2 AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b),
       |cnt1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1)
       |SELECT doc_id,
       |  count(*) AS n_bigrams,
       |  CAST(sum(c12) AS BIGINT) AS sum_c12,
       |  CAST(sum(c1) AS BIGINT) AS sum_c1,
       |  sum(c12)::DOUBLE / sum(c1) AS fit_score,
       |  CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
       |FROM bg JOIN cnt2 USING (b) JOIN cnt1 USING (w1)
       |GROUP BY doc_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_redact", qRedact, Some(qRedactSql)),
    QueryDef("q_lm_bigram", qLmBigram, Some(qLmBigramSql)),
    QueryDef("q_ccnet_buckets", qCcnetBuckets, Some(qCcnetBucketsSql)),
    QueryDef("q_dup_by_source", qDupBySource, Some(qDupBySourceSql)),
    QueryDef("q_mixture_rebalance", qMixtureRebalance, Some(qMixtureRebalanceSql)),
    QueryDef("q_temperature_mix", qTemperatureMix, Some(qTemperatureMixSql)),
    QueryDef("q_weighted_sample", qWeightedSample, Some(qWeightedSampleSql)),
    QueryDef("q_token_budget", qTokenBudget, Some(qTokenBudgetSql)),
    QueryDef("q_repetition", qRepetition, Some(qRepetitionSql)),
    QueryDef("q_stratified_sample", qStratifiedSample, Some(qStratifiedSampleSql)),
    QueryDef("q_tfidf", qTfIdf, Some(qTfIdfSql)),
    QueryDef("q_contamination", qContamination, Some(qContaminationSql)),
    QueryDef("q_decontaminate", qDecontaminate, Some(qDecontaminateSql)),
    QueryDef("q_decontaminate_fixpoint", qDecontaminateFixpoint,
      Some(qDecontaminateFixpointSql)),
    QueryDef("q_contamination_bloom", qContaminationBloom, Some(qContaminationSql)),
    QueryDef("q_dsir_vote", qDsirVote, Some(qDsirVoteSql)),
    QueryDef("q_bpe_tokens", qBpeTokens, Some(qBpeTokensSql)),
    QueryDef("q_curation", qCuration, Some(qCurationSql)),
    QueryDef("q_top_terms", qTopTerms, Some(qTopTermsSql)),
    QueryDef("q_text_stats", qTextStats, Some(qTextStatsSql), headline = true),
    QueryDef("q_char_diversity", qCharDiversity, Some(qCharDiversitySql)),
    QueryDef("q_lang_id", qLangId, Some(qLangIdSql)),
    QueryDef("q_fingerprint", qFingerprint, Some(qFingerprintSql)),
    QueryDef("q_train_split", qTrainSplit, Some(qTrainSplitSql)))
}
