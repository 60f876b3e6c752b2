package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The label-propagation lanes THROUGH the scaled-geometry dispatch: the
  * gate SFs sit below [[SimilarityOps.IvfScaleThreshold]], so the oracle
  * pins only the small geometry — this spec derives a 12.5k-vector corpus
  * (25× the sf0.001 embeddings under fresh ids, labels preserved) and
  * executes the lanes where `lshBitsFor` > 4 and `centRowsAuto` trains
  * √N hash-init cells, pinning what the stress bench measures but sbt
  * test otherwise never runs: the scaled LSH census stays complete and
  * label-valid, and the persisted-IVF lane stays ROW-IDENTICAL to inline
  * under the √N geometry (the shared-dispatch claim, not just the gate's
  * k=10 oracle). */
class LabelPropScaledSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 25× sf0.001 embeddings (12.5k vectors) as a standalone corpus dir. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaled").toString
    val e = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val copies = (0 until 25).map(k =>
      e.select((col("vec_id") + lit(k * 500L)).as("vec_id"),
        col("embedding"), col("label")))
    copies.reduce(_ unionByName _)
      .coalesce(4)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("scaled LSH vote (7-bit cells at 12.5k vectors): census complete, " +
      "labels valid, abstention share small under the multiprobe") {
    assert(LabelOps.lshBitsFor(12500L) === 7, "the dispatch must be active")
    val df = QueryRegistry.byName("q_label_prop_lsh").run(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).count()
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) === n,
      "every holdout vector lands in the census exactly once")
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    val preds = df.select(col("pred_label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert((preds - -1).subsetOf(labels))
    val abstained = df.filter(col("pred_label") === -1)
      .agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)
    assert(abstained * 10 <= n,
      s"multiprobe must keep coverage ≥ 90% at this density (abstained=$abstained/$n)")
    df.unpersist()
  }

  test("scaled IVF vote (√N cells): the persisted-store lane stays " +
      "row-identical to inline — the shared-dispatch certificate past " +
      "the oracle's geometry") {
    val inline = QueryRegistry.byName("q_label_prop_ivf").run(spark, dir)
    val indexed = QueryRegistry.byName("q_label_prop_ivf_indexed").run(spark, dir)
    assert(inline.exceptAll(indexed).count() === 0 &&
      indexed.exceptAll(inline).count() === 0,
      "inline and store-served votes must agree under √N geometry too")
    val n = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).count()
    assert(inline.agg(sum(col("n_docs"))).head.getLong(0) === n)
  }
}
