package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling for the `q_curation2` certification lane — the
  * r13 verdict flagged the full-corpus inline ablation at 6.17 s
  * driver-host (5.6% of suite wall, 2× the next lane) and asked for
  * "cheapen or formally accept". This harness made the cheapening
  * targeted instead of guessed, and records the round-14 findings:
  *
  *  - the inline retrain at sf0.1 is dominated by per-stage scheduling
  *    overhead, not data volume (625-doc sample ≈ 5.7 s vs 5000-doc
  *    corpus ≈ 9 s on the same host) — so sampling alone could not hit
  *    the ≤3 s target; RECORDING the inline side (a pure function of the
  *    immutable sample corpus, `_certificate` sidecar) is what did;
  *  - steady state after the restructure: certify_sampled ≈ 0.9 s (one
  *    6-row indexed sample serve + record compare), full lane ≈ 2.2 s on
  *    a loaded host (was ~10 s on the same host inline).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.operators.ProfileInline"
  */
object ProfileInline {
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

    // JIT + parquet-footer warm
    time("inline_lane_cold") {
      graft.QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    }
    time("inline_lane_warm") {
      graft.QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    }
    val d = Tables.table(spark, dir, "documents")
    time("clf_train") {
      ClassifyOps.trainCounts(d).agg(sum(col("c"))).collect()
    }
    time("clf_train_and_score") {
      ClassifyOps.scoreDocs(d, ClassifyOps.trainCounts(d))
        .agg(sum(col("is_correct"))).collect()
    }
    time("ccnet_inline") {
      TextOps.qCcnetBuckets(spark, dir)
        .groupBy(col("bucket")).count().collect()
    }
    time("winnow_fps_full") {
      WinnowOps.fpRows(d.select(col("doc_id"), col("text"))).count()
    }
    val sdir = time("ensure_sample_corpus") {
      CurationFunnel.ensureSampleCorpus(spark, dir)
    }
    time("inline_ledger_sample") {
      CurationFunnel.inlineLedgerOver(
        spark, Tables.table(spark, sdir, "documents")).collect()
    }
    time("indexed_ledger_sample") {
      graft.QueryRegistry.byName("q_curation2_indexed").run(spark, sdir).collect()
    }
    time("indexed_ledger_full") {
      graft.QueryRegistry.byName("q_curation2_indexed").run(spark, dir).collect()
    }
    time("certify_sampled") {
      CurationFunnel.certifySampled(spark, dir)
    }
    time("inline_lane_again") {
      graft.QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    }
    spark.stop()
  }
}
