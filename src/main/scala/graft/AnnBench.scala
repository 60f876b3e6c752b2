package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted-ANN geometry harness (not part of the driver contract):
  * build the three persisted index lanes at the given SF, then report
  * per-lane probe time (min of 2 warm passes, the Bench discipline) and
  * recall@5 vs the brute-force truth. This is the measurement behind the
  * round-8 production-geometry claim — that with k ≈ √N cells and
  * nprobe ≈ k/32 the composed IVF-PQ beats BOTH the cell-pruned exact
  * lane (IVF) and the flat code-scan lane (PQ) while holding
  * recall@5 ≥ 0.8. Run:
  *
  *   sbt "runMain graft.AnnBench /tmp/sfstress/sf10"
  */
/** Embeddings-only scale-up for [[AnnBench]] (documents etc. are dead
  * weight for the ANN lanes): K offset copies of the source embeddings.
  *
  *   sbt "runMain graft.EmbGen /root/testdata/sf0.1 /tmp/sfstress/emb2m 1000"
  */
object EmbGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: EmbGen <srcDir> <outDir> <K>")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = args(2).toInt
    val src = Tables.table(spark, args(0), "embeddings")
    val stride = {
      val mx = src.agg(max(col("vec_id"))).head().getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    (0 until k).map(i => src.withColumn("vec_id", col("vec_id") + lit(i * stride)))
      .reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"${args(1)}/embeddings.parquet")
    println(s"[embgen] ${spark.read.parquet(s"${args(1)}/embeddings.parquet").count()} rows")
    spark.stop()
  }
}

/** Production-width variant of [[EmbGen]]: widen the 64-dim source
  * embeddings to 64×`blocks` dims (each block a deterministically
  * JITTERED copy of the base vector — correlated like real embedding
  * dimensions, never verbatim), then replicate K× under offset ids.
  * This is the corpus for the IVFADC dimensional claim: at 768 dims the
  * exact lane reads and multiplies 12× more per candidate while ADC
  * stays PqM table lookups.
  *
  *   sbt "runMain graft.EmbGenWide /root/testdata/sf0.1 /tmp/sfstress/emb768 100 12"
  */
object EmbGenWide {

  /** Widen `src` embeddings to 64×`blocks` dims (each block a
    * deterministically jittered copy of the base vector) and replicate
    * `k`× under offset ids — factored out so the wide-dim recall spec
    * ([[graft.operators.WideDimAnnSpec]]) gates the same construction
    * the bench harness measures. */
  def widened(src: org.apache.spark.sql.DataFrame, k: Int, blocks: Int)
      : org.apache.spark.sql.DataFrame = {
    val stride = {
      val mx = src.agg(max(col("vec_id"))).head().getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    val wide = src.select(col("vec_id"), col("label"),
      flatten(transform(sequence(lit(0), lit(blocks - 1)), b =>
        transform(col("embedding"), (x, i) =>
          x + (pmod(xxhash64(col("vec_id") * 1231L + b * 97L + i.cast("long")),
            lit(1000L)).cast("float") / 1000.0f - 0.5f) * 0.05f))).as("embedding"))
    (0 until k).map(i => wide.withColumn("vec_id", col("vec_id") + lit(i * stride)))
      .reduce(_.unionByName(_))
      .select(col("vec_id"), col("embedding"), col("label"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: EmbGenWide <srcDir> <outDir> <K> <blocks>")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (k, blocks) = (args(2).toInt, args(3).toInt)
    widened(Tables.table(spark, args(0), "embeddings"), k, blocks)
      .repartition(32)
      .write.mode("overwrite").parquet(s"${args(1)}/embeddings.parquet")
    println(s"[embgen] ${spark.read.parquet(s"${args(1)}/embeddings.parquet").count()} rows, " +
      s"dim=${64 * blocks}")
    spark.stop()
  }
}

object AnnBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfstress/sf10")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = Tables.table(spark, dir, "embeddings").count()
    println(s"[annbench] corpus=$dir n=$n " +
      s"scaled=${n >= operators.SimilarityOps.IvfScaleThreshold} " +
      s"k=${operators.SimilarityOps.autoCellCount(n)} " +
      s"nprobe=${operators.SimilarityOps.autoNProbe(operators.SimilarityOps.autoCellCount(n))}")

    val lanes = Seq("q_ann_ivf_indexed", "q_ann_pq_indexed", "q_ann_ivfpq_indexed")

    // cold pass builds the persisted stores (timed separately — the
    // production cadence pays this once per corpus, not per query)
    lanes.foreach { q =>
      val t0 = System.nanoTime()
      QueryRegistry.byName(q).run(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"[annbench] $q%-22s cold(build+probe)=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // warm probes: min of 2 (the stores exist; this is the serving cost)
    lanes.foreach { q =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        QueryRegistry.byName(q).run(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val out = QueryRegistry.byName(q).run(spark, dir)
      val recall = operators.SimilarityOps.recallOf(spark, dir, out)
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      println(f"[annbench] $q%-22s warm=${ts.min}%.2fs recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
