package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val AllTables = Seq(
    "text_shingles", "shingle_df", "texts", "members",
    "edges", "labels", "doc_meta")

  private def rowsOf(dir: String, t: String): Map[Seq[Any], Long] =
    spark.read.parquet(s"$dir/$t.parquet").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def assertIndexEqual(appended: String, rebuilt: String): Unit =
    for (t <- AllTables)
      assert(rowsOf(appended, t) === rowsOf(rebuilt, t), s"table $t diverged")

  private def clusterRows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
      r.getLong(r.fieldIndex("cluster_id")),
      r.getLong(r.fieldIndex("is_keeper")))).toSet

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(rows).toDF("doc_id", "text").repartition(2)

  private def tmpIdx(tag: String): String =
    Files.createTempDirectory(s"graft-clidx-$tag").toString + "/idx"

  test("indexed clusters and canonical match the inline operators exactly") {
    // the reference side is the FULL inline recompute (not another indexed
    // lane): since round 16 q_dedup_clusters itself serves from the store,
    // so the oracle identity is re-proven here against inlineClustersOver
    val inlineC = clusterRows(DedupOps.inlineClustersOver(spark, sfDir))
    val indexedC = clusterRows(
      graft.QueryRegistry.byName("q_dedup_clusters_indexed").run(spark, sfDir))
    assert(indexedC === inlineC)
    assert(indexedC.nonEmpty)
    assert(clusterRows(
      graft.QueryRegistry.byName("q_dedup_clusters").run(spark, sfDir)) === inlineC)
    def canon(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet
    assert(canon(graft.QueryRegistry.byName("q_dedup_canonical_indexed").run(spark, sfDir))
      === canon(graft.QueryRegistry.byName("q_dedup_canonical").run(spark, sfDir)))
  }

  test("append ≡ full rebuild over the union — all seven tables, two batches") {
    val docs = Tables.table(spark, sfDir, "documents")
    val b = (lo: Long, hi: Long) => docs.filter(
      IncrementalDedup.bucketOf(col("doc_id")) >= lo &&
        IncrementalDedup.bucketOf(col("doc_id")) < hi)

    val appended = tmpIdx("app")
    ClusterIndex.buildIndex(b(0, 80), appended)
    ClusterIndex.appendToIndex(spark, appended, b(80, 90))
    ClusterIndex.appendToIndex(spark, appended, b(90, 100))
    val rebuilt = tmpIdx("reb")
    ClusterIndex.buildIndex(b(0, 100), rebuilt)

    assertIndexEqual(appended, rebuilt)
    val out = clusterRows(ClusterIndex.clustersFromIndex(spark, appended))
    assert(out === clusterRows(ClusterIndex.clustersFromIndex(spark, rebuilt)))
    assert(out.nonEmpty)
  }

  // The df cap makes edges NON-MONOTONE under appends. A batch that pushes
  // the A-B pair's only load-bearing shared shingle over the cap removes
  // the edge: the component must SPLIT, exactly as a rebuild would.
  test("cap-crossing append splits a component (edge removal)") {
    // A and B: 5-token texts sharing shingles {abc, bcd} of 3 each →
    // jaccard 2/(3+3-2) = 0.5 — edge. Two copies each so the split
    // leaves observable intra-copy clusters.
    val A = "a b c d e"; val B = "a b c d f"
    val corpus = docsDf(Seq(1L -> A, 2L -> A, 3L -> B, 4L -> B))
    // 49 copies of "a b c": df("a b c") 4 → 53 > 50 crosses the cap;
    // A, B lose it → shared {bcd}, jaccard 1/3 — edge must disappear
    val batch = docsDf((1000L until 1049L).map(_ -> "a b c"))

    val idx = tmpIdx("split")
    ClusterIndex.buildIndex(corpus, idx)
    val before = clusterRows(ClusterIndex.clustersFromIndex(spark, idx))
    assert(before === Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 0L), (4L, 1L, 0L)))

    ClusterIndex.appendToIndex(spark, idx, batch)
    val after = clusterRows(ClusterIndex.clustersFromIndex(spark, idx))
    assert(after === Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 3L, 1L), (4L, 3L, 0L)))

    val rebuilt = tmpIdx("split-reb")
    ClusterIndex.buildIndex(corpus.unionByName(batch), rebuilt)
    assertIndexEqual(idx, rebuilt)
  }

  // ...and the mirror image: dropping a NON-shared shingle from each side
  // shrinks the denominators, so jaccard rises across the threshold — an
  // old×old edge APPEARS and two components must MERGE.
  test("cap-crossing append creates an edge (component merge)") {
    // 6-token texts: shingles {abc,bcd,cde,deg} / {abc,bcd,cdf,dfh},
    // shared 2 of 4 → jaccard 2/6 — no edge; two intra-copy clusters.
    val A = "a b c d e g"; val B = "a b c d f h"
    val corpus = docsDf(Seq(1L -> A, 2L -> A, 3L -> B, 4L -> B))
    val before = {
      val idx = tmpIdx("merge-pre")
      ClusterIndex.buildIndex(corpus, idx)
      clusterRows(ClusterIndex.clustersFromIndex(spark, idx))
    }
    assert(before === Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 3L, 1L), (4L, 3L, 0L)))

    // push A's two private shingles over the cap (df 2 → 51): A keeps
    // {abc,bcd}, jaccard(A,B) = 2/(2+4-2) = 0.5 — edge appears
    val batch = docsDf(
      (1000L until 1049L).map(_ -> "c d e") ++
        (2000L until 2049L).map(_ -> "d e g"))
    val idx = tmpIdx("merge")
    ClusterIndex.buildIndex(corpus, idx)
    ClusterIndex.appendToIndex(spark, idx, batch)
    val after = clusterRows(ClusterIndex.clustersFromIndex(spark, idx))
    assert(after === Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 0L), (4L, 1L, 0L)))

    val rebuilt = tmpIdx("merge-reb")
    ClusterIndex.buildIndex(corpus.unionByName(batch), rebuilt)
    assertIndexEqual(idx, rebuilt)
  }

  test("cluster and canonical reads touch only index files") {
    val docs = Tables.table(spark, sfDir, "documents")
    val idx = tmpIdx("plan")
    ClusterIndex.buildIndex(docs, idx)
    for (out <- Seq(ClusterIndex.clustersFromIndex(spark, idx),
        ClusterIndex.canonicalFromIndex(spark, idx))) {
      val scans = out.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case other => other.toString
          }
      }
      assert(scans.nonEmpty)
      assert(scans.forall(_.contains(new java.io.File(idx).getName)),
        s"unexpected non-index scans: ${scans.filterNot(_.contains(idx))}")
    }
  }

  test("q_dedup_canonical certificate: first run records and the served " +
      "output equals the full inline recompute; a poisoned record " +
      "self-heals; a diverged sample store throws loudly") {
    val root = Files.createTempDirectory("graft-canon-cert").toString
    spark.conf.set(StoreRoot.ConfKey, root)
    try {
      def canonRows(df: DataFrame): Set[(Long, Long, Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val lane = graft.QueryRegistry.byName("q_dedup_canonical")
      val served = canonRows(lane.run(spark, sfDir))
      // the lane's oracle identity, re-proven here end to end: the
      // store-served full map equals the full inline CC recompute
      assert(served === canonRows(DedupOps.inlineCanonicalOver(spark, sfDir)))
      val sdir = CurationFunnel.ensureSampleCorpus(spark, sfDir)
      val cert = java.nio.file.Paths.get(sdir, "_canonical_certificate")
      assert(Files.exists(cert), "first run must record the sample proof")
      val recorded = Files.readString(cert)

      // poisoned-but-parseable record: served != record → the inline side
      // is recomputed, matches, and the record self-heals (no throw)
      Files.writeString(cert,
        "graft-canonical-certificate-v2\n1\n1\nend")
      assert(canonRows(lane.run(spark, sfDir)) === served)
      assert(Files.readString(cert) === recorded, "record must self-heal")

      // a genuinely diverged sample store: collapse every text into ONE
      // cluster label — the served sample output departs from the inline
      // truth and the certificate must fail loudly
      val sIdx = StoreRoot.dir("graft-cluster-index-" + IndexStamp.dirKey(
        IndexStamp.identity(sdir, "documents.parquet", "cluster-v1")))
      val members = spark.read.parquet(s"$sIdx/members.parquet")
      val poisoned = members.select(col("tkey")).distinct()
        .withColumn("label", lit(0L))
      val tmp = Files.createTempDirectory("graft-poison").toString
      poisoned.write.mode("overwrite").parquet(s"$tmp/labels.parquet")
      val fs = new org.apache.hadoop.fs.Path(sIdx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$sIdx/labels.parquet"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/labels.parquet"),
        new org.apache.hadoop.fs.Path(s"$sIdx/labels.parquet"))
      Files.writeString(cert, "garbage") // force the inline re-proof
      val e = intercept[IllegalStateException] { lane.run(spark, sfDir) }
      assert(e.getMessage.contains("certificate FAILED"))
    } finally spark.conf.unset(StoreRoot.ConfKey)
  }
}
