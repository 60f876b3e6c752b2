package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{EmbGenWide, QueryRegistry, SparkTestSession, Tables}

/** Production-width ANN gate (round-9, verdict #6 + ADVICE medium #2):
  * the 768-dim evidence was a one-off side harness, and the ADC encode
  * path sliced only the first 64 dims — so a wide-dim regression (or the
  * dimensional blind spot itself) was invisible to every committed
  * check. This spec builds the persisted IVFADC store over the SAME
  * widened construction `scripts/ann_bench.sh` measures (sf0.001 × 6
  * replicas × 12 jittered blocks = 3000 vectors at 768 dims) and pins:
  * the codebook carries dim/PqSub = 96 subspaces (every block coded,
  * not 8), the cells carry all 96 code columns, and recall@5 = 1.0 for
  * all three persisted lanes (each query's 5 exact replicas dominate
  * cosine and share its cell, so full recall is structural — anything
  * less means the probe or the codes broke). */
class WideDimAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-widedim").toString
    EmbGenWide.widened(
      Tables.table(spark, "/root/testdata/sf0.001", "embeddings"), 6, 12)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("wide-dim IVFADC store codes every block: 96 subspaces at 768 dims") {
    val ivfDir = IvfIndex.ensureIndex(spark, dir)
    val cb = IvfIndex.readCodebook(spark, ivfDir)
    assert(SimilarityOps.pqMOf(cb) === 768 / 8,
      "codebook subspace count must derive from the corpus dimension")
    val cellCols = spark.read.parquet(s"$ivfDir/cells.parquet").columns
      .count(_.matches("c\\d+"))
    assert(cellCols === 96, "cells must carry one code column per subspace")
  }

  test("recall@5 = 1.0 for the three persisted lanes at 768 dims") {
    Seq("q_ann_ivf_indexed", "q_ann_pq_indexed", "q_ann_ivfpq_indexed")
      .foreach { lane =>
        val out = QueryRegistry.byName(lane).run(spark, dir)
        val rec = SimilarityOps.recallOf(spark, dir, out)
          .agg(avg(col("recall_at_k"))).head().getDouble(0)
        assert(rec === 1.0, s"$lane recall@5 at 768 dims")
      }
  }
}
