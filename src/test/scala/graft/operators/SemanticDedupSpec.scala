package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession, Tables}

/** Invariants of the SemDeDup keep-rule (oracle equality is the driver
  * gate's job): total accounting, per-cluster survivorship, and the
  * neighbor-witness property, verified against an INDEPENDENT cosine
  * computation from the raw embeddings. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val Tau = 0.35

  private lazy val out = QueryRegistry.byName("q_semantic_dedup").run(spark, dir)
    .persist()

  test("partition accounting: one row per vector, kept in {0,1}, both classes present") {
    val n = Tables.table(spark, dir, "embeddings").count()
    assert(out.count() === n)
    assert(out.select(col("vec_id")).distinct().count() === n)
    val kept = out.agg(sum(col("kept"))).head().getLong(0)
    assert(kept > 0 && kept < n, s"vacuous keep rule: $kept of $n")
    assert(out.filter(col("kept") < 0 || col("kept") > 1).isEmpty)
  }

  test("every cluster keeps at least one member") {
    val bad = out.groupBy(col("cluster"))
      .agg(sum(col("kept")).as("k"), count(lit(1)).as("n"))
      .filter(col("k") === 0)
    assert(bad.isEmpty)
  }

  test("dropped vectors have a tau-neighbor in-cluster; isolated vectors are kept") {
    // independent cosine recomputation from the raw table, joined to the
    // operator's own cluster assignment
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(graft.functions.VectorOps.dot(col("v"), col("v"))))
      .join(out.select(col("vec_id"), col("cluster"), col("kept")), "vec_id")
    val o = e.select(col("cluster"), col("vec_id").as("o_id"),
      col("v").as("ov"), col("norm").as("onorm"))
    val hasNbr = e.join(o, Seq("cluster"))
      .filter(col("o_id") =!= col("vec_id"))
      .filter(graft.functions.VectorOps.dot(col("v"), col("ov"))
        / (col("norm") * col("onorm")) >= Tau)
      .select(col("vec_id")).distinct().withColumn("nbr", lit(true))
    val checked = e.join(hasNbr, Seq("vec_id"), "left")
    // kept=0 requires a neighbor witness; no neighbor forces kept=1
    assert(checked.filter(col("kept") === 0 && col("nbr").isNull).isEmpty,
      "dropped without any tau-neighbor")
    assert(checked.filter(col("nbr").isNull && col("kept") === 0).isEmpty)
  }
}
