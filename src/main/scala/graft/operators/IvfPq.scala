package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed IVF-PQ — the FAISS-shaped production vector index, assembled
  * from the two halves the suite already trains and persists separately:
  * the learned-centroid IVF quantizer routes each query to `nprobe`
  * cells, and product-quantization codes ADC-score ONLY those cells'
  * members; the top-PqR proposals get the exact cosine rescore. At
  * 100 TB the propose phase therefore reads `nprobe/k` of the corpus
  * (cell-partitioned directory pruning, the IvfIndex contract) × PqM
  * bytes per vector (the PqIndex memory-traffic contract) — the two
  * multiplicative savings a production ANN stack actually deploys
  * (IVFADC, Jégou et al. 2011).
  *
  * Both lanes feed the SAME scoring tail ([[SimilarityOps.pqProposeRescore]]):
  *  - inline: cells + codes computed on one corpus scan against the two
  *    memoized models;
  *  - indexed: cell membership read from ONLY the probed cell dirs of
  *    the persisted [[IvfIndex]] and codes from the persisted [[PqIndex]]
  *    code store (both ensure-built and SHARED with their standalone
  *    lanes — composition adds no third index on disk).
  *
  * The oracle unrolls BOTH training loops (10 Lloyd rounds for the
  * quantizer, 3 per-subspace rounds for the codebook) in one CTE chain —
  * routing, encoding, ADC, and rescore all ride the rows+schema+hash
  * gate. Recall at these parameters (nprobe=4 of k=10 label-cells,
  * PqR=150) is bounded below by the IVF lane's measured 0.82 restricted
  * further only by PQ propose order — the operative guarantee is the
  * gate's exactness of the whole composed algorithm, as with the
  * standalone approximate lanes.
  */
object IvfPq {
  import SimilarityOps._

  private def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val centRows = learnedCentRows(spark, dir)
    val cb = pqCodebook(spark, dir)
    val en = pqNormalized(spark, dir)
    val cent = centRows.toDF("cluster", "cv")
    val queries = en.filter(col("vec_id") < NumQueries)
    // probe cells per query: centroid-distance rank over the k-row
    // broadcast table (the ivfLearnedTopK construction)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("cr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(dist2(col("qv"), col("cv")), col("cluster"))))
      .filter(col("cr") <= IvfNProbe)
      .select(col("query_id"), col("cluster"))
    // ONE corpus scan carries cell assignment AND the codebook's codes
    val codesWithCell = en.select(
      Seq(col("vec_id"),
        assignExpr(centRows, col("v")).as("cluster")) ++
        (0 until pqMOf(cb)).map(mm => pqCodeFor(cb, mm,
          slice(col("nv"), mm * PqSub + 1, PqSub)).as(s"c$mm")): _*)
    // two skinny broadcasts, not one fat one: joining the distance
    // tables onto the probe list FIRST replicates each query's
    // subspaces×256-double tables once per probed cell (~nprobe× the
    // bytes) before broadcasting — route candidates through the
    // (query_id, cluster) pairs, then attach tables per query_id
    val cand = codesWithCell
      .join(broadcast(probes), Seq("cluster"))
      .join(broadcast(pqAdcTables(queries, cb)), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), pqAdcApprox(pqMOf(cb)).as("approx"))
    pqProposeRescore(cand, queries, en)
  }

  private def qAnnIvfPqIndexed(spark: SparkSession, dir: String): DataFrame = {
    // ONE store, the true IVFADC layout (round 8): the IvfIndex cells
    // carry their members' PQ codes, so the probe reads ONLY the probed
    // cell directories' code columns (column pruning skips the 64-double
    // vectors), ADC-scores them against the broadcast distance tables,
    // and rescores the top-PqR proposals from the SAME probed dirs' raw
    // columns — no full code-store scan, no cross-store join (the
    // round-7 shape joined a flat PqIndex scan against the probed
    // members, which cost more than it saved; measured in PERF.md).
    // Codes are encoded with the memoized full-corpus codebook, so the
    // output is row-identical to the inline lane and rides its oracle.
    val ivfDir = IvfIndex.ensureIndex(spark, dir)
    val cb = IvfIndex.readCodebook(spark, ivfDir)
    val (probes, codes, rescore) = IvfIndex.probedCodes(spark, ivfDir)
    val queries = pqNormalize(
      Tables.table(spark, dir, "embeddings").filter(col("vec_id") < NumQueries))
    val cand = codes
      .join(broadcast(probes), Seq("cluster"))
      .join(broadcast(pqAdcTables(queries, cb)), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), pqAdcApprox(pqMOf(cb)).as("approx"))
      // double-append / compaction-window duplicates are value-identical
      // (frozen models) — keep one, ranking stays exact
      .dropDuplicates("query_id", "vec_id")
    pqProposeRescore(cand, queries, rescore)
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_ivfpq", qAnnIvfPq, Some(qAnnIvfPqOracle)),
    QueryDef("q_ann_ivfpq_indexed", qAnnIvfPqIndexed, Some(qAnnIvfPqOracle)))
}
