package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Composed IVF-PQ contracts: the indexed lane (persisted IvfIndex cell
  * routing + persisted PqIndex codes) must be row-identical to the inline
  * composition, and every reported neighbor must live in one of its
  * query's probed cells (the routing actually restricts the candidate
  * set). Cross-engine exactness — both trainings unrolled — rides the
  * DuckDB oracle gate. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank")))
      .toSet

  test("q_ann_ivfpq_indexed ≡ inline q_ann_ivfpq") {
    val inline = collectRows(QueryRegistry.byName("q_ann_ivfpq").run(spark, dir))
    val indexed = collectRows(QueryRegistry.byName("q_ann_ivfpq_indexed").run(spark, dir))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }

  test("every reported neighbor lies in one of its query's probed cells") {
    val centRows = SimilarityOps.learnedCentRows(spark, dir)
    val (_, assigned) = SimilarityOps.learnedIvf(spark, dir)
    val cellOf = assigned.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap
    // probe cells per query, recomputed independently driver-side
    def dist2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val queries = SimilarityOps.learnedIvf(spark, dir)._2
      .filter(col("vec_id") < SimilarityOps.NumQueries)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val probed: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> centRows.map { case (c, cv) => (dist2(qv, cv), c) }
        .sortBy(identity).take(SimilarityOps.IvfNProbe).map(_._2).toSet
    }.toMap
    val out = collectRows(QueryRegistry.byName("q_ann_ivfpq").run(spark, dir))
    assert(out.nonEmpty)
    out.foreach { case (qid, nid, _, _) =>
      assert(probed(qid).contains(cellOf(nid)),
        s"neighbor $nid of query $qid is outside the probed cells")
    }
  }
}
