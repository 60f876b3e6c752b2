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

  /** Native codegen'd dot product — bit-equal to the composed
    * aggregate(zip_with(...)) fold (NativeVsComposedSpec). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  private def withNorm(df: DataFrame): DataFrame = {
    val d = df.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    d.withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

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
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= K)
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
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= K)
  }

  // --- q_ann_ivf: IVF-style cell-probed ANN ------------------------------
  // Coarse quantizer: one centroid per label cell, component-wise exact
  // MEDIAN (rank-based — deterministic across engines, unlike a mean whose
  // double-summation order diverges). Query → nearest centroid by cosine
  // → search only that cell. The 100-TB shape: centroids are a tiny
  // broadcast table; the corpus is probed per-cell, never cross-joined.
  private def qIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(table(spark, dir, "embeddings"))
    // (label, pos, val) — pos is 0-based here and 1-based in the oracle;
    // both sides only use it for ordering, so alignment is consistent.
    val comps = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "val")))
    val w = Window.partitionBy(col("label"), col("pos")).orderBy(col("val"))
    val cent = comps
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("label"), col("pos"))))
      .filter(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2"))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("val")) / count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))
      .withColumn("cnorm", sqrt(dot(col("cv"), col("cv"))))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    // assign each query to its nearest cell (tie-break on label)
    val wAssign = Window.partitionBy(col("query_id"))
      .orderBy((dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm"))).desc, col("label"))
    val assigned = q.crossJoin(broadcast(cent))
      .withColumn("cr", row_number().over(wAssign))
      .filter(col("cr") === 1)
      .select(col("query_id"), col("qv"), col("qnorm"), col("label"))
    // probe only the assigned cell
    val scored = e.join(broadcast(assigned), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cosine"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wTop).cast("long")).filter(col("rank") <= K)
  }

  private val qIvfSql =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
       |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN embedding::DOUBLE[]]), (a,x) -> a+x)) AS norm
       |  FROM embeddings),
       |comps AS (
       |  SELECT label, i AS pos, v[i] AS val FROM e, UNNEST(range(1, 65)) AS r(i)),
       |med AS (
       |  SELECT label, pos, SUM(val) / COUNT(*) AS c FROM (
       |    SELECT label, pos, val,
       |      ROW_NUMBER() OVER (PARTITION BY label, pos ORDER BY val) AS rn,
       |      COUNT(*) OVER (PARTITION BY label, pos) AS n
       |    FROM comps) t
       |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
       |  GROUP BY label, pos),
       |cent AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM med GROUP BY label),
       |centn AS (
       |  SELECT label, cv,
       |    sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN cv]), (a,x) -> a+x)) AS cnorm
       |  FROM cent),
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e WHERE vec_id < $NumQueries),
       |assigned AS (
       |  SELECT query_id, qv, qnorm, label FROM (
       |    SELECT q.query_id, q.qv, q.qnorm, c.label,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        list_reduce(list_prepend(0.0, [q.qv[i]*c.cv[i] FOR i IN range(1, 65)]), (a,x) -> a+x)
       |          / (q.qnorm * c.cnorm) DESC, c.label) AS cr
       |    FROM q, centn c) t
       |  WHERE cr = 1),
       |scored AS (
       |  SELECT a.query_id, e.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(0.0, [a.qv[i]*e.v[i] FOR i IN range(1, 65)]), (acc,x) -> acc+x)
       |      / (a.qnorm * e.norm) AS cosine
       |  FROM e JOIN assigned a USING (label)
       |  WHERE e.vec_id != a.query_id)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $K""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_cosine_topk", qBruteTopK, Some(qBruteTopKSql), headline = true),
    QueryDef("q_ann_lsh", qLsh, None),
    QueryDef("q_ann_ivf", qIvf, Some(qIvfSql), headline = true))
}
