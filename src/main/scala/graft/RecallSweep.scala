package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH geometry tuning harness (not part of the driver contract): for each
  * candidate bands×bits geometry, measure mean recall@5 against the
  * brute-force truth plus wall time at the given SF. Run:
  *
  *   sbt "runMain graft.RecallSweep /root/testdata/sf0.01"
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (bands, bits, multiprobe): probe=1-bit query-side multiprobe — same
    // corpus index, query fans out ×(bits+1) buckets per band
    val geometries = Seq(
      (8, 4, false), (16, 4, false), (8, 6, false), (12, 6, false),
      (16, 6, false), (16, 8, false),
      (4, 4, true), (6, 4, true), (8, 4, true), (4, 6, true), (8, 6, true))
    // warm once so the first geometry doesn't pay cold JIT
    operators.SimilarityOps.lshTopK(spark, dir, 8, 4).count()
    geometries.foreach { case (bands, bits, probe) =>
      val t0 = System.nanoTime()
      val approx = operators.SimilarityOps.lshTopK(spark, dir, bands, bits, probe)
      val recall = operators.SimilarityOps.recallOf(spark, dir, approx)
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      val tag = if (probe) "+probe" else "      "
      println(f"[sweep] bands=$bands%2d bits=$bits%d$tag planes=${bands * bits}%3d  recall@5=$recall%.3f  time=$dt%.2fs")
    }
    // portable axis-sign LSH (the oracle-checked ANN twin)
    locally {
      val t0 = System.nanoTime()
      val recall = operators.SimilarityOps
        .recallOf(spark, dir, operators.SimilarityOps.axisLshTopK(spark, dir))
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] axis-sign 4x4+probe (portable)  recall@5=$recall%.3f  time=$dt%.2fs")
    }
    // IVF: the nprobe knob (cells = label partitions, median centroids)
    Seq(1, 2, 4).foreach { np =>
      val t0 = System.nanoTime()
      val recall = operators.SimilarityOps
        .recallOf(spark, dir, operators.SimilarityOps.ivfTopK(spark, dir, np))
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] ivf nprobe=$np  recall@5=$recall%.3f  time=$dt%.2fs")
    }
    // learned IVF: same probing over k-medians-trained cells
    Seq(1, 2, 4).foreach { np =>
      val t0 = System.nanoTime()
      val recall = operators.SimilarityOps
        .recallOf(spark, dir, operators.SimilarityOps.ivfLearnedTopK(spark, dir, np))
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"[sweep] ivf-learned nprobe=$np  recall@5=$recall%.3f  time=$dt%.2fs")
    }
    spark.stop()
  }
}
