package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-quality diagnostics a curation pipeline publishes BESIDE its
  * accuracy numbers — is the classifier's confidence trustworthy
  * (calibration), and do independent quality signals actually agree
  * beyond chance (inter-rater agreement)? Both ride the repo's integer
  * fixed-point discipline so the whole diagnostic is rows+schema+hash
  * gated, like q_classify_eval.
  *
  * Scale shapes: calibration reuses the classifier's distinct-text score
  * surface (ClassifyOps.textScores — wordcount-shaped; nothing here adds
  * a shuffle beyond a class-bounded window and a 10-bucket map-side agg);
  * kappa is two full-scan doc aggregates reduced to ONE summary row of
  * counts (the n² in the kappa denominator bounds exact BIGINT arithmetic
  * to n < 3e9 docs — past that, compute the same census on a uniform
  * sample, the standard move for a scalar diagnostic).
  */
object EvalOps {
  import Tables.table

  // --- q_calibration: reliability diagram of the lang classifier --------
  // Confidence = the top-2 margin normalized by the per-doc score SPREAD:
  //   conf_pm = (top1 − top2)·1000 div (top1 − min)   ∈ [0, 1000]
  // (a raw top1/(top1+top2) ratio is useless for a fixed-point linear
  // scorer — the Laplace smoothing floor dominates every class total, so
  // it pins to ~500; the spread-normalized margin is scale-free and
  // exact in BIGINT). A doc whose classes all tie (spread 0) has zero
  // usable signal → conf 0 by convention. Output: per confidence decile,
  // how often the prediction was RIGHT — a calibrated scorer's acc_pm
  // rises with the bin; flat acc_pm means the margin carries no signal.
  private def qCalibration(spark: SparkSession, dir: String): DataFrame =
    calibrationAgainst(spark, dir,
      ClassifyOps.trainCounts(table(spark, dir, "documents")))

  /** The production-cadence twin: the same reliability diagram served
    * from the PERSISTED classifier model (built once per corpus identity,
    * the q_classify_freq_indexed family) — model counts ≡ inline counts
    * by the family's append≡rebuild contract, so the lane rides the same
    * oracle. */
  private def qCalibrationIndexed(spark: SparkSession, dir: String): DataFrame =
    calibrationAgainst(spark, dir,
      ClassifyIndex.modelCounts(spark, ClassifyIndex.ensureModel(spark, dir)))

  private def calibrationAgainst(
      spark: SparkSession, dir: String, counts: DataFrame): DataFrame = {
    val d = table(spark, dir, "documents")
    val (members, scored) = ClassifyOps.textScores(
      d.filter(col("doc_id") % ClassifyOps.TestMod === 0L),
      counts)
    val wRank = Window.partitionBy(col("tkey"))
      .orderBy(col("total").desc, col("lang"))
    val top2 = scored.withColumn("rn", row_number().over(wRank))
      .groupBy(col("tkey"))
      .agg(
        max(when(col("rn") === 1, col("lang"))).as("pred_lang"),
        max(when(col("rn") === 1, col("total"))).as("t1"),
        max(when(col("rn") === 2, col("total"))).as("t2"),
        min(col("total")).as("tmin"))
      .select(col("tkey"), col("pred_lang"),
        when(col("t1") === col("tmin"), 0L)
          .otherwise(expr("((t1 - t2) * 1000) div (t1 - tmin)")).as("conf_pm"))
    val perDoc = members.join(top2, "tkey")
      .select(
        when(col("pred_lang") === col("true_lang"), 1L).otherwise(0L).as("ok"),
        col("conf_pm"))
    perDoc
      .select(col("ok"), col("conf_pm"),
        least(expr("conf_pm div 100"), lit(9L)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_correct"),
        sum(col("conf_pm")).as("sum_conf"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        expr("(n_correct * 1000) div n_docs").as("acc_pm"),
        expr("sum_conf div n_docs").as("mean_conf_pm"))
  }

  private val qCalibrationSql =
    s"""${ClassifyOps.scoringCtes(s"doc_id % ${ClassifyOps.TestMod} = 0")},
       |r AS (
       |  SELECT doc_id, true_lang, lang, total,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY total DESC, lang) AS rn
       |  FROM sc),
       |p AS (
       |  SELECT doc_id, true_lang,
       |    MAX(CASE WHEN rn = 1 THEN lang END) AS pred_lang,
       |    MAX(CASE WHEN rn = 1 THEN total END) AS t1,
       |    MAX(CASE WHEN rn = 2 THEN total END) AS t2,
       |    MIN(total) AS tmin
       |  FROM r GROUP BY 1, 2),
       |c AS (
       |  SELECT CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END AS ok,
       |    CASE WHEN t1 = tmin THEN 0
       |      ELSE ((t1 - t2) * 1000) // (t1 - tmin) END AS conf_pm
       |  FROM p)
       |SELECT LEAST(conf_pm // 100, 9)::BIGINT AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ok) AS BIGINT) AS n_correct,
       |  CAST((SUM(ok) * 1000) // COUNT(*) AS BIGINT) AS acc_pm,
       |  CAST(SUM(conf_pm) // COUNT(*) AS BIGINT) AS mean_conf_pm
       |FROM c GROUP BY 1""".stripMargin

  // --- q_quality_kappa: chance-corrected agreement of two quality gates --
  // Rater A: the length gate (enough tokens to carry signal). Rater B:
  // the lexical-diversity gate (distinct-token share — boilerplate and
  // template spam score low). Cohen's kappa in per-mille, EXACT integer
  // arithmetic: with agree = Σ[a=b], pe_num = a1·b1 + a0·b0,
  //   kappa_pm = 1000·(n·agree − pe_num) div (n² − pe_num).
  // A near-zero kappa says the gates capture independent failure modes
  // (both are worth running); kappa → 1000 says one is redundant.
  private val MinToks = 50L
  private val MinDiversityPm = 450L

  private def qQualityKappa(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val per = d
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        countDistinct(col("w")).as("n_distinct"))
    val sig = per.select(
      when(col("n_toks") >= MinToks, 1L).otherwise(0L).as("a"),
      when(expr("(n_distinct * 1000) div n_toks") >= MinDiversityPm, 1L)
        .otherwise(0L).as("b"))
    sig
      .agg(count(lit(1)).as("n"),
        sum(col("a")).as("a1"), sum(col("b")).as("b1"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
      .select(col("n"), col("a1"), col("b1"), col("n_agree"),
        expr("(n_agree * 1000) div n").as("po_pm"),
        expr("(a1 * b1 + (n - a1) * (n - b1))").as("pe_num"))
      .select(col("n"), col("a1"), col("b1"), col("n_agree"), col("po_pm"),
        when(col("n") * col("n") === col("pe_num"), lit(0L))
          .otherwise(expr(
            "(1000 * (n * n_agree - pe_num)) div (n * n - pe_num)"))
          .as("kappa_pm"))
  }

  private val qQualityKappaSql =
    s"""WITH per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |    CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
       |        FROM documents) GROUP BY 1),
       |sig AS (
       |  SELECT CASE WHEN n_toks >= $MinToks THEN 1 ELSE 0 END AS a,
       |    CASE WHEN (n_distinct * 1000) // n_toks >= $MinDiversityPm
       |      THEN 1 ELSE 0 END AS b
       |  FROM per),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1,
       |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM sig)
       |SELECT n, a1, b1, n_agree, (n_agree * 1000) // n AS po_pm,
       |  CASE WHEN n * n = a1 * b1 + (n - a1) * (n - b1) THEN 0
       |    ELSE (1000 * (n * n_agree - (a1 * b1 + (n - a1) * (n - b1))))
       |      // (n * n - (a1 * b1 + (n - a1) * (n - b1))) END AS kappa_pm
       |FROM s""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_calibration", qCalibration, Some(qCalibrationSql)),
    QueryDef("q_calibration_indexed", qCalibrationIndexed,
      Some(qCalibrationSql)),
    QueryDef("q_quality_kappa", qQualityKappa, Some(qQualityKappaSql)))
}
