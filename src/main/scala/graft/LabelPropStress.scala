package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-geometry LSH label-propagation stress rung (round-15 verdict
  * #7): the oracle pins q_label_prop_lsh's 4-bit geometry below
  * [[graft.operators.SimilarityOps.IvfScaleThreshold]] (10k vectors), and
  * `LabelPropScaledSpec` exercises the ≥10k dispatch on a synthetic 12.5k
  * corpus — but the ≥20k stress point the dispatch was MEASURED against
  * (PERF.md round 14: 36.5 s per-cell quadratic vote before the dispatch)
  * only ran ad hoc. This main makes it a reproducible rung: derive a
  * ≥20k-vector corpus with [[StressGen]] (embeddings replicated verbatim
  * under fresh ids, labels preserved), run the exact-kNN lane and the
  * scaled LSH lane end-to-end, and record wall times plus the
  * DIAGONAL-AGREEMENT statistic the gate pins at small scale
  * (`LabelEvalOpsSpec`): the census mass where pred_label == true_label,
  * LSH vs exact. One JSON line, committed as the round's stress record.
  *
  *   sbt "runMain graft.LabelPropStress /root/testdata/sf0.1 10"
  */
object LabelPropStress {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/tmp/sfstress/labelprop-f$factor"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      StressGen.run(spark, src, dir, factor)
    val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val bits = graft.operators.LabelOps.lshBitsFor(nVec)
    require(bits > 4, s"stress corpus must engage the scaled dispatch " +
      s"(n=$nVec -> bits=$bits)")

    def timed(name: String): (Double, DataFrame) = {
      spark.sparkContext.setJobDescription(s"labelprop-stress: $name")
      val df = QueryRegistry.byName(name).run(spark, dir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      (dt, df)
    }
    // warm both code paths once on the small gate corpus so cold JIT
    // doesn't land on the measured runs (the Bench discipline)
    Seq("q_knn_label_prop", "q_label_prop_lsh").foreach { n =>
      QueryRegistry.byName(n).run(spark, src)
        .write.mode("overwrite").format("noop").save()
    }

    val (tExact, exactDf) = timed("q_knn_label_prop")
    val (tLsh, lshDf) = timed("q_label_prop_lsh")

    def diag(df: DataFrame): Long = df
      .filter(col("pred_label") === col("true_label"))
      .agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)
    def census(df: DataFrame): Long =
      df.agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)

    val nHoldout = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).count()
    val dExact = diag(exactDf)
    val dLsh = diag(lshDf)
    val cExact = census(exactDf)
    val cLsh = census(lshDf)
    // the LSH census covers EVERY holdout vector; the exact lane caps its
    // query batch by design (query_id < BatchCap — at the stress scale
    // that is the original-id copies only), so the populations differ and
    // the gate's raw diagonal-MASS pin (LabelEvalOpsSpec) is compared
    // here as the diagonal SHARE of each lane's own census — the stress
    // corpus is verbatim copies, so the capped population is
    // statistically the whole one.
    val complete = cLsh == nHoldout && cExact > 0
    val shareExact = dExact.toDouble / cExact
    val shareLsh = dLsh.toDouble / cLsh
    val agree = dExact > 0 &&
      math.abs(shareExact - shareLsh) <= 0.15 * shareExact
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    spark.stop()
    println(s"""{"metric":"labelprop_stress","src":"$src","factor":$factor,""" +
      s""""n_vectors":$nVec,"lsh_bits":$bits,"n_holdout":$nHoldout,""" +
      s""""census_exact":$cExact,"census_lsh":$cLsh,""" +
      s""""census_complete":$complete,""" +
      s""""diag_exact":$dExact,"diag_lsh":$dLsh,""" +
      s""""diag_share_exact":${ms(shareExact)},"diag_share_lsh":${ms(shareLsh)},""" +
      s""""diag_agreement_within_15pct":$agree,""" +
      s""""sec_exact":${ms(tExact)},"sec_lsh":${ms(tLsh)}}""")
  }
}
