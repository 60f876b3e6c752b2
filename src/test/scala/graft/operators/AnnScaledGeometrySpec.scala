package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** Production IVF geometry (round 8): above
  * [[SimilarityOps.IvfScaleThreshold]] vectors the persisted index trains
  * √N hash-init cells probed at nprobe ≈ k/32 (the FAISS IVFADC
  * convention, Jégou et al. 2011) instead of the oracle-pinned k=10
  * label cells.
  *
  * The fixture is a 12k-vector corpus built from 6 deterministically
  * JITTERED copies of sf0.1's 2000 embeddings — every vector is globally
  * distinct, so recall is measured against genuine near-neighbors, not
  * inflated by verbatim duplicates (the honest version of the stress
  * corpora's replication).
  */
class AnnScaledGeometrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NCopies = 6
  private lazy val corpusDir: String = {
    val out = Files.createTempDirectory("graft-ann-scaled").toString
    val base = Tables.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"),
        col("label"))
    // copy 0 verbatim; copies 1..5 perturb every component by a
    // hash-derived uniform in ±0.04 — a pure function of (vec_id,
    // component), so the corpus is exactly reproducible
    val copies = (0 until NCopies).map { i =>
      val shifted = base.withColumn("vec_id", col("vec_id") + lit(i * 10000L))
      if (i == 0) shifted
      else shifted.withColumn("v", transform(col("v"), (x, j) =>
        x + (pmod(xxhash64(col("vec_id") * lit(97L) + j.cast("long")), lit(1000L))
          .cast("double") / 1000.0 - 0.5) * 0.08))
    }.reduce(_.unionByName(_))
    copies
      .select(col("vec_id"), col("v").cast("array<float>").as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private lazy val n: Long =
    Tables.table(spark, corpusDir, "embeddings").count()

  private lazy val indexDir: String = {
    val d = Files.createTempDirectory("graft-ann-scaled-idx").toString + "/idx"
    IvfIndex.buildFromCorpus(spark, corpusDir, d)
    d
  }

  private def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
    SimilarityOps.recallOf(spark, corpusDir, approx)
      .agg(avg(col("recall_at_k"))).head().getDouble(0)

  test("geometry dispatch: √N cells above the threshold, k=10 at the gate SFs") {
    assert(n >= SimilarityOps.IvfScaleThreshold)
    val k = SimilarityOps.autoCellCount(n)
    assert(k === math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = SimilarityOps.centRowsAuto(spark, corpusDir)
    // k-medians can empty a few cells; the surviving count must stay √N-shaped
    assert(cents.size > k / 2 && cents.size <= k)
    // the gate corpus stays on the oracle-pinned label-cell quantizer
    val gate = SimilarityOps.centRowsAuto(spark, "/root/testdata/sf0.001")
    assert(gate === SimilarityOps.learnedCentRows(spark, "/root/testdata/sf0.001"))
    // production nprobe lands in the 10..32 band, a small probed fraction
    val np = SimilarityOps.autoNProbe(cents.size)
    assert(np >= 10 && np <= 32 && np < cents.size / 3)
  }

  test("scaled persisted IVF: recall@5 >= 0.8 at the auto nprobe") {
    val r = meanRecall(IvfIndex.topKIndexed(spark, indexDir))
    assert(r >= 0.8, s"ivf-indexed recall@5 $r")
  }

  test("filtered probe holds recall at the √N production geometry") {
    // the candidate-stage filter (vec_id % 2 = 0) is orthogonal to the
    // hash-init cells, so filtered search exercises the general case:
    // roughly half of every probed cell survives the predicate, and the
    // probe must still recover the filtered truth
    val truth = graft.QueryRegistry.byName("q_ann_filtered").run(spark, corpusDir)
      .select(col("query_id"), col("neighbor_id"))
    val approx = IvfIndex.topKIndexed(spark, indexDir,
        memberFilter = Some(col("vec_id") % 2 === 0))
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    assert(approx.filter(col("neighbor_id") % 2 =!= 0).count() === 0)
    val r = truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)))
        .as("recall"))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(r >= 0.8, s"filtered ivf-indexed recall@5 $r")
  }

  test("selectivity-adaptive probing: 5% filter escalates starved queries " +
      "and holds recall; a fed filter keeps the fixed plan") {
    // the rare-attribute audit case: vec_id % 20 = 0 keeps 5% of members,
    // so a fixed nprobe's probed cells hold too few filtered candidates
    val rare = col("vec_id") % 20 === 0
    val e = Tables.table(spark, corpusDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    // filtered brute-force truth at k=5
    val q = e.filter(col("vec_id") < SimilarityOps.NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.filter(rare)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (SimilarityOps.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = IvfIndex.topKIndexed(spark, indexDir, memberFilter = Some(rare))
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    assert(approx.filter(col("neighbor_id") % 20 =!= 0).count() === 0)
    val r = truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)))
        .as("recall"))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(r >= 0.8, s"adaptive filtered ivf-indexed recall@5 $r")
    // the plan grows ONLY under starvation: the rare filter escalates at
    // least one query past the fixed depth; the 50%-selectivity filter
    // (every probed cell still feeds k) keeps the fixed plan everywhere
    val np = SimilarityOps.autoNProbe(
      spark.read.parquet(s"$indexDir/centroids.parquet").count().toInt)
    val rarePlan = IvfIndex.plannedProbeCounts(spark, indexDir, Some(rare))
    assert(rarePlan.values.exists(_ > np),
      s"5% selectivity must escalate some query past nprobe=$np")
    val fedPlan = IvfIndex.plannedProbeCounts(
      spark, indexDir, Some(col("vec_id") % 2 === 0))
    assert(fedPlan.values.forall(_ === np),
      "a fed filter must keep the fixed per-query plan")
  }

  test("probe touches only the probed cells, not the corpus") {
    val cents = spark.read.parquet(s"$indexDir/centroids.parquet").count()
    val (probes, members) = IvfIndex.probedMembers(spark, indexDir)
    val np = SimilarityOps.autoNProbe(cents.toInt)
    // the pruning contract is PER QUERY: exactly nprobe of k cells (a ~9%
    // fraction here) — the union over 20 spread-out queries legitimately
    // covers most cells, so the per-query shape is what's asserted
    val perQuery = probes.groupBy(col("query_id")).count()
      .select(col("count")).distinct().collect().map(_.getLong(0)).toSet
    assert(perQuery === Set(np.toLong), s"per-query probed cells $perQuery != $np")
    assert(np.toLong < cents / 5, s"probed fraction $np of $cents cells")
    val probed = probes.select(col("cluster")).distinct().count()
    assert(probed <= SimilarityOps.NumQueries.toLong * np)
    // members come only from probed cells
    assert(members.join(probes.select("cluster").distinct(), Seq("cluster"), "left_anti").isEmpty)
  }

  test("the INLINE filtered lane shares the adaptive probe plan: 5% " +
      "selectivity holds recall@5 like the store lane") {
    // same starvation math as the persisted lane (IvfIndex.escalateProbes,
    // one shared body) driven from the in-memory assigned corpus; the
    // 0.5-selectivity gate lane (q_ann_filtered_ivf) stays on its oracle
    // because a fed filter never escalates
    val dir = "/root/testdata/sf0.001"
    val rare = col("vec_id") % 20 === 0
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val q = e.filter(col("vec_id") < SimilarityOps.NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.filter(rare)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (SimilarityOps.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = SimilarityOps.ivfLearnedTopK(spark, dir, memberFilter = Some(rare))
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    assert(approx.filter(col("neighbor_id") % 20 =!= 0).count() === 0)
    val r = truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)))
        .as("recall"))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(r >= 0.8, s"adaptive filtered inline recall@5 $r")
  }

  test("composed IVF-PQ on the scaled geometry keeps recall@5 >= 0.8") {
    // ensure the shared IVF store exists at the production geometry, then
    // run the registered composed lane end-to-end on this corpus
    val out = graft.QueryRegistry.byName("q_ann_ivfpq_indexed").run(spark, corpusDir)
    val r = meanRecall(out)
    assert(r >= 0.8, s"ivfpq-indexed recall@5 $r")
  }
}
