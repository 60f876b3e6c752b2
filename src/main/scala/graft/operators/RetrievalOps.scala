package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Serving-side retrieval over the curated corpus: filtered vector
  * search and hybrid lexical+vector fusion — the two query shapes a
  * trained-model stack runs against its training-data store (attribute-
  * constrained nearest neighbors for curation audits; hybrid retrieval
  * for eval-set construction and RAG-style lookups).
  *
  *  - FILTERED ANN (the big-ann-benchmarks "filtered track" shape): the
  *    metadata predicate is applied at the CANDIDATE stage — before the
  *    rescore, pushed into the member scan — never as a post-filter on
  *    the top-k (which silently under-fills results: filtering k=5
  *    survivors of an unfiltered top-5 returns ~k/2 rows at 50%
  *    selectivity, the classic filtered-search bug). Three lanes:
  *    exact brute force (the truth baseline), the learned-cell IVF
  *    probe (the inline oracle-pinned geometry), and the persisted
  *    [[IvfIndex]] store (the production cadence — rides the probe
  *    lane's oracle, filter pushed into the probed-cell parquet read).
  *    The demo predicate `vec_id % 2 = 0` stands in for any metadata
  *    tag (license class, language, split membership); selectivity 0.5
  *    and independence from the cell geometry make it the honest test —
  *    a label-aligned predicate would degenerate to single-cell probing.
  *  - HYBRID SEARCH (reciprocal rank fusion — Cormack, Clarke &
  *    Buettcher, SIGIR 2009): lexical more-like-this ranking (shared
  *    distinct terms with the query document — integer-exact, the
  *    q_tfidf/q_keyword_search fixed-point family) fused with cosine
  *    top-k over the aligned embeddings (doc_id ≡ vec_id) by
  *    RRF(d) = Σ_lists 1/(60+rank_list(d)), kept integer as
  *    1000000 div (60+rank) ppm so the fusion hash-gates. A document
  *    missing from one list contributes 0 from that list — the
  *    standard union-of-candidates convention.
  *
  * Scale shape: the query set is bounded ([[SimilarityOps.NumQueries]]
  * rows — broadcast everywhere), so the lexical side is one corpus scan
  * hash-joined against a broadcast term list (the shuffle carries only
  * matched (query, doc) pairs), the vector side is one corpus scan with
  * a per-partition top-k window, and the fusion runs over ≤ 2·CandK
  * rows per query. No corpus×corpus join anywhere.
  */
object RetrievalOps {
  import Tables.table

  private val K = SimilarityOps.K // final top-k per query (5)
  private val NumQueries = SimilarityOps.NumQueries // 20

  /** Candidate-list depth per retrieval mode before fusion. */
  private val CandK = 20

  /** RRF smoothing constant — the paper's k=60. */
  private val RrfK = 60

  private def withNormE(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.withNorm(table(spark, dir, "embeddings"))

  // --- q_ann_filtered: exact filtered search (brute-force baseline) ------
  private def qAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val e = withNormE(spark, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    // the predicate prunes the corpus scan; queries need NOT satisfy it
    val scored = e.filter(col("vec_id") % 2 === 0)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (SimilarityOps.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= K)
  }

  private val qAnnFilteredSql =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN embedding::DOUBLE[]]), (a,x) -> a+x)) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(0.0, [q.v[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      / (q.norm * e.norm) AS cosine
       |  FROM e q JOIN e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < $NumQueries AND e.vec_id % 2 = 0)
       |SELECT * FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $K""".stripMargin

  // --- q_ann_filtered_ivf: the learned-cell probe with the filter --------
  // Probes are chosen by the UNfiltered geometry (the filter constrains
  // results, not where they live); the predicate prunes the member side
  // of the probed cells before the rescore.
  private def qAnnFilteredIvf(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.ivfLearnedTopK(spark, dir,
      memberFilter = Some(col("vec_id") % 2 === 0))

  private def qAnnFilteredIvfSql: String =
    SimilarityOps.qIvfLearnedSqlWith("e.vec_id % 2 = 0")

  // --- q_ann_filtered_indexed: the persisted-store lane ------------------
  // Same output as the inline probe (store cells ≡ learned assignment at
  // gate geometry; filter commutes with the cell read), so it rides the
  // same oracle — the q_ann_ivf_indexed discipline.
  private def qAnnFilteredIndexed(spark: SparkSession, dir: String): DataFrame =
    IvfIndex.topKIndexed(spark, IvfIndex.ensureIndex(spark, dir),
      memberFilter = Some(col("vec_id") % 2 === 0))

  /** Query-set bound and candidate depth, shared with the postings-store
    * serving twin ([[SearchIndex]]). */
  private[operators] def HybridQueryMax: Long = NumQueries.toLong
  private[operators] def HybridCandK: Int = CandK

  /** BM25-style hard document-frequency cap (the round-10 verdict's one
    * named scale-killer): a term present in MORE than half the corpus
    * has negative BM25 idf — a stopword whose postings make every
    * document a candidate of every query, so the matched-pair volume of
    * the lexical join grows as |queries|·N·|stopwords| on a real Zipfian
    * corpus (the sf10 measurement: 15.1 s, 5× the next query). Dropping
    * those terms BEFORE pair generation bounds the join at the
    * informative tail; `df·2 ≤ n_docs` keeps idf ≥ 0 terms, integer-
    * exact so the cap hash-gates. `dt` is the DISTINCT (doc_id, term)
    * table (df = its per-term row count); `nDocs` a 1-row (n_docs)
    * frame. Shared by the inline lane and the postings-store serving
    * twin ([[SearchIndex.sharedTermRanks]]) so the two cannot drift. */
  private[operators] def dfCapTerms(dt: DataFrame, nDocs: DataFrame): DataFrame =
    dfCapFilter(dt.groupBy(col("term")).agg(count(lit(1)).as("df")), nDocs)

  /** The cap PREDICATE alone, over an already-aggregated (term, df)
    * table — the one body both df sources flow through: the inline
    * lane's read-derived df (above) and the postings store's persisted
    * `term_df` summary ([[SearchIndex]]), so the served cap cannot
    * drift from the computed one. */
  private[operators] def dfCapFilter(termDf: DataFrame, nDocs: DataFrame): DataFrame =
    termDf.crossJoin(broadcast(nDocs))
      .filter(col("df") * 2 <= col("n_docs"))
      .select(col("term"))

  /** The lexical candidate list over a DISTINCT (doc_id, term) table:
    * shared surviving-term count per (query, doc) pair, integer-exact.
    * Callers pass a df-capped `dt`. */
  private def lexRanksOf(dt: DataFrame): DataFrame = {
    val qt = dt.filter(col("doc_id") < NumQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val wLex = Window.partitionBy(col("query_id"))
      .orderBy(col("shared").desc, col("doc_id"))
    dt.join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("lex_rank", row_number().over(wLex).cast(LongType))
      .filter(col("lex_rank") <= CandK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
  }

  // --- q_hybrid_search: reciprocal rank fusion ----------------------------
  private def qHybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val dt0 = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), " "))).as("term"))
    // n_docs counts INDEXABLE docs (text non-NULL) so the cap cannot
    // drift from the postings-store twin, whose ledger only ever sees
    // docs that produced posting rows — a NULL text explodes to nothing
    // on both paths
    val nDocs = docs.filter(col("text").isNotNull).agg(count(lit(1)).as("n_docs"))
    val dt = dt0.join(broadcast(dfCapTerms(dt0, nDocs)), "term")
    hybridWithLexical(spark, dir, lexRanksOf(dt))
  }

  // --- q_hybrid_search_zipf: the df cap on a Zipfian vocabulary ----------
  // The driver corpus's 31-term vocabulary is the lexical WORST case:
  // 30 of 31 terms sit in >75% of documents, so on the gate fixture the
  // cap correctly reduces the lexical lists to the one informative term.
  // This lane derives a deterministic Zipfian term table from the corpus
  // itself — doc d carries term zK for every K in 1..ZipfVocab dividing
  // d — so df(zK) = ⌈N/K⌉, the Zipf profile of a real corpus: the cap
  // drops exactly z1 (df = N, the stopword) and keeps the tail, and the
  // surviving lexical ranking stays rich (shared counts follow the
  // divisor lattice). Hash-gated with the cap in BOTH engines' SQL —
  // the fixture the round-10 verdict asked for, derived instead of
  // generated because /root/testdata is driver-owned.
  private[operators] val ZipfVocab = 32

  private[operators] def zipfTerms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(sequence(lit(1), lit(ZipfVocab))).as("k"))
      .filter(col("doc_id") % col("k") === 0)
      .select(col("doc_id"), concat(lit("z"), col("k")).as("term"))

  private def qHybridSearchZipf(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val dt0 = zipfTerms(docs)
    // zipf terms derive from doc_id arithmetic, not text — every doc
    // carries terms, so n_docs counts them all
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dt = dt0.join(broadcast(dfCapTerms(dt0, nDocs)), "term")
    hybridWithLexical(spark, dir, lexRanksOf(dt))
  }

  /** RRF fusion against a caller-supplied lexical candidate list
    * (query_id, doc_id, lex_rank) — the inline lane passes its raw-text
    * ranking; [[SearchIndex]] passes the identical ranking served from
    * the postings store. */
  private[operators] def hybridWithLexical(
      spark: SparkSession, dir: String, lex: DataFrame): DataFrame = {
    // vector list: cosine top-CandK over the aligned embeddings
    val e = withNormE(spark, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val wVec = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("doc_id"))
    val vec = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        (SimilarityOps.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
          .as("cosine"))
      .withColumn("vec_rank", row_number().over(wVec).cast(LongType))
      .filter(col("vec_rank") <= CandK)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
    // RRF over the union of the two candidate lists, fixed-point ppm
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_ppm",
        expr(s"CASE WHEN lex_rank > 0 THEN 1000000 div ($RrfK + lex_rank) ELSE 0 END") +
          expr(s"CASE WHEN vec_rank > 0 THEN 1000000 div ($RrfK + vec_rank) ELSE 0 END"))
      .withColumn("rank", row_number().over(wTop).cast(LongType))
      .filter(col("rank") <= K)
  }

  /** Exposed to [[SearchIndex]]: the postings-store hybrid lane is
    * row-identical and rides this oracle unchanged. */
  private[operators] def qHybridOracle: String = qHybridSearchSql

  private val qHybridSearchSql = hybridSqlWith(
    """SELECT DISTINCT doc_id, t.term
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents) d,
      |       UNNEST(w) AS t(term)""".stripMargin,
    "SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL")

  private val qHybridSearchZipfSql = hybridSqlWith(
    s"""SELECT doc_id, 'z' || k::VARCHAR AS term
      |  FROM documents, UNNEST(range(1, ${ZipfVocab + 1})) AS r(k)
      |  WHERE doc_id % k = 0""".stripMargin,
    "SELECT COUNT(*) AS n_docs FROM documents")

  /** The hybrid-RRF oracle over any DISTINCT (doc_id, term) CTE, with
    * the df cap applied identically to the Spark lanes; `ndCte` matches
    * each lane's n_docs definition (indexable docs for the text lane,
    * all docs for the id-derived zipf lane). */
  private def hybridSqlWith(dtCte: String, ndCte: String): String =
    s"""WITH dt0 AS (
       |  $dtCte),
       |nd AS ($ndCte),
       |keep AS (
       |  SELECT term
       |  FROM (SELECT term, COUNT(*) AS df FROM dt0 GROUP BY 1) f, nd
       |  WHERE df * 2 <= n_docs),
       |dt AS (SELECT dt0.doc_id, dt0.term FROM dt0 JOIN keep USING (term)),
       |qt AS (SELECT doc_id AS query_id, term FROM dt WHERE doc_id < $NumQueries),
       |lex AS (
       |  SELECT query_id, doc_id, lex_rank FROM (
       |    SELECT s.query_id, s.doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.query_id
       |        ORDER BY s.shared DESC, s.doc_id) AS lex_rank
       |    FROM (
       |      SELECT qt.query_id, dt.doc_id, COUNT(*) AS shared
       |      FROM dt JOIN qt USING (term)
       |      WHERE dt.doc_id != qt.query_id
       |      GROUP BY 1, 2) s) r
       |  WHERE lex_rank <= $CandK),
       |e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN embedding::DOUBLE[]]), (a,x) -> a+x)) AS norm
       |  FROM embeddings),
       |vec AS (
       |  SELECT query_id, doc_id, vec_rank FROM (
       |    SELECT s.query_id, s.doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.query_id
       |        ORDER BY s.cosine DESC, s.doc_id) AS vec_rank
       |    FROM (
       |      SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
       |        list_reduce(list_prepend(0.0, [q.v[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |          / (q.norm * e.norm) AS cosine
       |      FROM e q JOIN e ON e.vec_id != q.vec_id
       |      WHERE q.vec_id < $NumQueries) s) r
       |  WHERE vec_rank <= $CandK),
       |fused AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |    COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |    COALESCE(lex.lex_rank, 0) AS lex_rank,
       |    COALESCE(vec.vec_rank, 0) AS vec_rank,
       |    (CASE WHEN lex.lex_rank IS NOT NULL
       |          THEN 1000000 // ($RrfK + lex.lex_rank) ELSE 0 END) +
       |    (CASE WHEN vec.vec_rank IS NOT NULL
       |          THEN 1000000 // ($RrfK + vec.vec_rank) ELSE 0 END) AS rrf_ppm
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
       |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_ppm, rank FROM (
       |  SELECT query_id, doc_id, lex_rank, vec_rank, rrf_ppm,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf_ppm DESC, doc_id) AS rank
       |  FROM fused) t
       |WHERE rank <= $K""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_filtered", qAnnFiltered, Some(qAnnFilteredSql)),
    QueryDef("q_ann_filtered_ivf", qAnnFilteredIvf, Some(qAnnFilteredIvfSql)),
    QueryDef("q_ann_filtered_indexed", qAnnFilteredIndexed, Some(qAnnFilteredIvfSql)),
    QueryDef("q_hybrid_search", qHybridSearch, Some(qHybridSearchSql), headline = true),
    QueryDef("q_hybrid_search_zipf", qHybridSearchZipf, Some(qHybridSearchZipfSql)))
}
