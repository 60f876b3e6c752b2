package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q_gopher_rules — the Gopher quality-filter rule set (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", appendix A1.1), the published
  * heuristic battery most large-corpus pipelines start from. Each rule is
  * reported per document as its own column (the operator a pipeline
  * ablates rule-by-rule), plus the conjunction:
  *
  *  - r_count:   50 ≤ word count ≤ 100 000
  *  - r_meanlen: mean word length in [3, 10] characters — fixed-point
  *               ((Σ len)·10 div n in [30, 100]), no float division
  *  - r_alpha:   ≥ 80% of words contain at least one alphabetic char
  *               (permille ≥ 800)
  *  - r_stop:    ≥ 2 distinct stop words present (the Gopher "contains
  *               common English words" proxy)
  *
  * (The line-shape rules — bullet-start / ellipsis-end fractions — are
  * omitted: the corpus is single-line by construction, so they would be
  * vacuously true; the four above all genuinely cut on it.)
  *
  * Scale shape: dedup-first — the rule battery is a pure function of the
  * text, computed once per DISTINCT text entirely inside array HOFs (no
  * explode, no shuffle except the final doc attach), attributed back to
  * doc_ids by the narrow tid join. Integer-exact throughout so both
  * engines agree bit-for-bit.
  */
object GopherRules {
  import Tables.table

  private val MinWords = 50L
  private val MaxWords = 100000L
  /** Stop list: must match the oracle literal below. */
  private val Stops = Seq("the", "a", "and", "of", "to", "in", "is", "with")

  private def qGopherRules(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val w: Column = split(trim(col("text")), " ")
    val n = size(w).cast(LongType)
    val charSum = aggregate(transform(w, t => length(t).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val alphaWords = size(filter(w, t => t.rlike("[A-Za-z]"))).cast(LongType)
    val stopsPresent =
      size(array_intersect(array_distinct(w), array(Stops.map(lit): _*))).cast(LongType)
    val perText = d.select(col("text")).distinct()
      .select(xxhash64(col("text")).as("tid"),
        n.as("n_words"),
        (col("text") =!= "").as("nonempty"),
        charSum.as("char_sum"),
        alphaWords.as("alpha_words"),
        stopsPresent.as("n_stops"))
      .select(col("tid"), col("n_words"),
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).as("bCount"),
        (col("char_sum") * 10 >= col("n_words") * 30 &&
          col("char_sum") * 10 <= col("n_words") * 100).as("bMean"),
        (col("alpha_words") * 1000 >= col("n_words") * 800).as("bAlpha"),
        (col("n_stops") >= 2L).as("bStop"))
    def b(c: Column): Column = when(c, 1L).otherwise(0L)
    d.select(col("doc_id"), xxhash64(col("text")).as("tid"))
      .join(perText, Seq("tid"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        b(coalesce(col("bCount"), lit(false))).as("r_count"),
        b(coalesce(col("bMean"), lit(false))).as("r_meanlen"),
        b(coalesce(col("bAlpha"), lit(false))).as("r_alpha"),
        b(coalesce(col("bStop"), lit(false))).as("r_stop"),
        b(coalesce(col("bCount") && col("bMean") && col("bAlpha") && col("bStop"),
          lit(false))).as("kept"))
  }

  private val qGopherRulesSql = {
    val stops = Stops.map("'" + _ + "'").mkString(", ")
    s"""WITH pt AS (
       |  SELECT text,
       |    len(w)::BIGINT AS n_words,
       |    list_reduce(list_prepend(0::BIGINT,
       |      list_transform(w, t -> length(t)::BIGINT)), (a, x) -> a + x) AS char_sum,
       |    len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))::BIGINT AS alpha_words,
       |    len(list_intersect(list_distinct(w), [$stops]))::BIGINT AS n_stops
       |  FROM (SELECT text, string_split(trim(text), ' ') AS w
       |        FROM (SELECT DISTINCT text FROM documents))),
       |r AS (
       |  SELECT text, n_words,
       |    (n_words >= $MinWords AND n_words <= $MaxWords) AS b_count,
       |    (char_sum * 10 >= n_words * 30 AND char_sum * 10 <= n_words * 100) AS b_mean,
       |    (alpha_words * 1000 >= n_words * 800) AS b_alpha,
       |    (n_stops >= 2) AS b_stop
       |  FROM pt)
       |SELECT d.doc_id,
       |  COALESCE(r.n_words, 0) AS n_words,
       |  COALESCE(r.b_count, FALSE)::BIGINT AS r_count,
       |  COALESCE(r.b_mean, FALSE)::BIGINT AS r_meanlen,
       |  COALESCE(r.b_alpha, FALSE)::BIGINT AS r_alpha,
       |  COALESCE(r.b_stop, FALSE)::BIGINT AS r_stop,
       |  COALESCE(r.b_count AND r.b_mean AND r.b_alpha AND r.b_stop, FALSE)::BIGINT AS kept
       |FROM documents d LEFT JOIN r USING (text)""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_gopher_rules", qGopherRules, Some(qGopherRulesSql)))
}
