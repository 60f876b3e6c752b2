package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling harness for the indexed curation funnel's
  * serving cost (the AnnBench discipline applied to the funnel): times
  * each model-backed signal in isolation so "where do the warm seconds
  * go" is a committed, reproducible measurement instead of an argument.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.operators.ProfileFunnel"
  *
  * Round-10 record at sf0.1 (PERF.md): warm lane 4.1–4.8 s =
  * classifier scoring 1.34 + LM corpus scoring 1.58 + winnow match
  * 0.74 + cutoff sampling ~0.3 + char signals 0.12 (native, map-only)
  * + the gate aggregate. Round 13 removed the two scoring passes from
  * the serving path without fusing them (which would have duplicated
  * the stores' arithmetic across modules, the round-9 divergence
  * class): the per-doc votes are scored ONCE at materialization
  * ([[CurationFunnel.ensureVotes]], memoized by corpus identity) and
  * the warm lane reads the narrow (doc_id, is_correct, bucket) scan —
  * measured 1.65–2.15 s warm at sf0.1 (was 4.1–4.8 s); the standalone
  * clf/LM/ccnet timings below now measure the one-time
  * materialization cost, not the serving floor. */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm stores + JIT
    time("full_lane_cold") {
      graft.QueryRegistry.byName("q_curation2_indexed").run(spark, dir).collect()
    }
    time("full_lane_warm") {
      graft.QueryRegistry.byName("q_curation2_indexed").run(spark, dir).collect()
    }
    val d = Tables.table(spark, dir, "documents")
    val clf = ClassifyIndex.ensureModel(spark, dir)
    val lm = LmIndex.ensureModel(spark, dir)
    val win = WinnowIndex.ensureIndex(spark, dir)
    time("char_signals") {
      d.select(graft.functions.CharDiversity.stats(col("text")).as("st"))
        .agg(sum(element_at(col("st"), 1))).collect()
    }
    time("clf_score") {
      ClassifyOps.scoreDocs(d, ClassifyIndex.modelCounts(spark, clf))
        .agg(sum(col("is_correct"))).collect()
    }
    time("lm_score_corpus") {
      LmIndex.scoreDocs(spark, d, lm).agg(sum(col("n_bigrams"))).collect()
    }
    time("ccnet_buckets") {
      TextOps.ccnetBucketsFrom(d, dd => LmIndex.scoreDocs(spark, dd, lm))
        .groupBy(col("bucket")).count().collect()
    }
    time("winnow_matches_store") {
      WinnowOps.matchesFrom(
        WinnowIndex.fpRowsFromIndex(spark, win).drop("tid")).count()
    }
    time("full_lane_again") {
      graft.QueryRegistry.byName("q_curation2_indexed").run(spark, dir).collect()
    }
    spark.stop()
  }
}
