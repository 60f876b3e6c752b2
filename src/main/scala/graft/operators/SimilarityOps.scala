package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - brute-force cosine top-k: the exactness baseline. The query set is
  *    broadcast; the corpus side streams — one scan, no shuffle of the
  *    corpus, a per-partition top-k via the rank window (Spark pushes the
  *    rn<=k filter into a WindowGroupLimit, so no full sort materializes).
  *  - LSH-bucketed ANN: the 100-TB path — deterministic random-hyperplane
  *    signatures, candidates only within matching buckets.
  *
  * Cosine arithmetic is a left fold from 0.0 over float-widened-to-double
  * elements, bit-identical to the DuckDB oracle's list_reduce fold.
  */
object SimilarityOps {
  import Tables.table

  private val K = 5
  private val NumQueries = 20

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  // --- q_ann_cosine_topk: brute-force exact top-k ------------------------
  private def qBruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(table(spark, dir, "embeddings"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
  }

  private val qBruteTopKSql =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN embedding::DOUBLE[]]), (a,x) -> a+x)) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(0.0, [q.v[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      / (q.norm * e.norm) AS cosine
       |  FROM e q JOIN e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT * FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $K""".stripMargin

  // --- q_ann_lsh: random-hyperplane LSH bucketing ------------------------
  // Hyperplane p component i ∈ {-1,+1} derived from xxhash64(p*64+i) —
  // deterministic, no stored model. Bucket = 12-bit sign signature;
  // candidates share the query's bucket. Recall is approximate by design
  // (rows-only check); the shape is the linear-scale ANN path.
  private val NumPlanes = 8

  private def qLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(table(spark, dir, "embeddings"))
    // sign bit per plane: dot(v, hyperplane_p) > 0
    val bucket = expr(
      s"""aggregate(
         |  transform(sequence(0, ${NumPlanes - 1}), p ->
         |    CASE WHEN aggregate(
         |      zip_with(v, sequence(0, 63), (x, i) ->
         |        x * (CASE WHEN (xxhash64(p * 64 + i) & 1L) = 1L THEN 1.0D ELSE -1.0D END)),
         |      0.0D, (acc, x) -> acc + x) > 0.0D
         |    THEN shiftleft(1L, p) ELSE 0L END),
         |  0L, (acc, x) -> acc | x)""".stripMargin)
    val eb = e.withColumn("bucket", bucket).cache()
    val q = eb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("bucket"))
    val scored = eb.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_cosine_topk", qBruteTopK, Some(qBruteTopKSql), headline = true),
    QueryDef("q_ann_lsh", qLsh, None))
}
