package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("query_id")),
      r.getLong(r.fieldIndex("neighbor_id")),
      r.getLong(r.fieldIndex("rank")))).toSet

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ivf-$tag").toString + "/idx"

  test("indexed lane is row-identical to the inline learned-IVF lane") {
    val inline = graft.QueryRegistry.byName("q_ann_ivf_learned").run(spark, sfDir)
    val indexed = graft.QueryRegistry.byName("q_ann_ivf_indexed").run(spark, sfDir)
    assert(rows(indexed) === rows(inline))
    assert(rows(indexed).nonEmpty)
  }

  test("appendToIndex ≡ rebuild with the same frozen centroids") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val cents = SimilarityOps.learnedCentRows(spark, sfDir)
    val a = emb.filter(col("vec_id") % 10 < 8)
    val b = emb.filter(col("vec_id") % 10 >= 8)

    val appended = freshDir("app")
    IvfIndex.buildIndex(spark, appended, cents, a)
    IvfIndex.appendToIndex(spark, appended, b)
    val rebuilt = freshDir("reb")
    IvfIndex.buildIndex(spark, rebuilt, cents, emb)

    assert(rows(IvfIndex.topKIndexed(spark, appended)) ===
      rows(IvfIndex.topKIndexed(spark, rebuilt)))
    // the append landed as its own epoch — O(batch) publish, not a rewrite
    val epochs = new java.io.File(s"$appended/cells.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq === Seq("epoch=0", "epoch=1"))
  }

  test("probe plan reads ONLY the probed cell directories") {
    val indexDir = freshDir("plan")
    IvfIndex.buildFromCorpus(spark, sfDir, indexDir)
    val out = IvfIndex.topKIndexed(spark, indexDir)

    // independently computed expectation: per-query nprobe nearest cells
    val cents = spark.read.parquet(s"$indexDir/centroids.parquet").collect()
      .map(r => (r.get(r.fieldIndex("cluster")).asInstanceOf[Number].longValue,
        r.getSeq[Double](r.fieldIndex("cv")))).toSeq.sortBy(_._1)
    val qvs = spark.read.parquet(s"$indexDir/cells.parquet")
      .filter(col("vec_id") < 20).select(col("v")).collect()
      .map(_.getSeq[Double](0))
    val perQuery = qvs.map(qv =>
      IvfIndex.probeCells(cents, qv, SimilarityOps.IvfNProbe))
    assert(perQuery.forall(_.size === SimilarityOps.IvfNProbe))
    val expected = perQuery.flatten.toSet
      .map((c: Long) => s"cells.parquet/epoch=0/cluster=$c")

    val scanned = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case other => Seq(other.toString)
        }
    }.flatten
    assert(scanned.nonEmpty)
    // every scan path is a probed cell dir inside the index — the
    // embeddings table and non-probed cells are structurally absent
    assert(scanned.forall(_.contains(new java.io.File(indexDir).getName)))
    val scannedSuffixes = scanned.map(_.replaceFirst(".*?/cells\\.parquet/", "cells.parquet/")).toSet
    assert(scannedSuffixes === expected)
  }

  test("crashed staging dirs are invisible to readers") {
    val indexDir = freshDir("crash")
    IvfIndex.buildFromCorpus(spark, sfDir, indexDir)
    val before = rows(IvfIndex.topKIndexed(spark, indexDir))
    for (staging <- Seq(s"$indexDir/cells.parquet/.epoch-1.tmp",
        s"$indexDir/stats.parquet/.stats-1.tmp")) {
      val d = new java.io.File(staging)
      assert(d.mkdirs())
      Files.write(new java.io.File(d, "part-junk.parquet").toPath, Array[Byte](1, 2, 3))
    }
    assert(rows(IvfIndex.topKIndexed(spark, indexDir)) === before)
    val drift = IvfIndex.driftReport(spark, indexDir)
    assert(!drift.retrain)
  }

  test("drifted appends flag a retrain; in-distribution appends don't") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = freshDir("drift")
    val cents = SimilarityOps.learnedCentRows(spark, sfDir)
    IvfIndex.buildIndex(spark, indexDir, cents, emb)
    assert(!IvfIndex.driftReport(spark, indexDir).retrain)

    // an in-distribution batch (a resample of the corpus under fresh ids)
    // tracks the baseline tightness
    IvfIndex.appendToIndex(spark, indexDir,
      emb.filter(col("vec_id") % 7 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val inDist = IvfIndex.driftReport(spark, indexDir)
    assert(inDist.appendedRows > 0)
    assert(!inDist.retrain, s"in-distribution append flagged retrain: $inDist")

    // a shifted batch lands far from every frozen centroid → retrain
    IvfIndex.appendToIndex(spark, indexDir,
      emb.filter(col("vec_id") % 7 === 1)
        .withColumn("vec_id", col("vec_id") + 200000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(25.0f))))
    val drifted = IvfIndex.driftReport(spark, indexDir)
    assert(drifted.retrain,
      s"shifted append not flagged: $drifted")
    assert(drifted.appendedMean > drifted.baselineMean)

    // retrain = rebuild on the grown corpus: fresh centroids see the
    // drifted region, the baseline resets, and the flag clears
    val grown = emb.unionByName(
      emb.filter(col("vec_id") % 7 === 1)
        .withColumn("vec_id", col("vec_id") + 200000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(25.0f))))
    IvfIndex.buildIndex(spark, indexDir, cents, grown)
    val after = IvfIndex.driftReport(spark, indexDir)
    assert(!after.retrain)
    assert(after.appendedRows === 0L)
  }

  test("drift policy: maybeRetrain rebuilds from the store and re-arms the detector") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = freshDir("retrain")
    val cents = SimilarityOps.learnedCentRows(spark, sfDir)
    IvfIndex.buildIndex(spark, indexDir, cents, emb)
    // below threshold: no action
    assert(!IndexPolicy.maybeRetrain(spark, indexDir, 1.5))

    val shifted = emb.filter(col("vec_id") % 7 === 1)
      .withColumn("vec_id", col("vec_id") + 200000)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(25.0f)))
    IvfIndex.appendToIndex(spark, indexDir, shifted)
    val idsBefore = spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(IvfIndex.driftReport(spark, indexDir).retrain)

    // the policy fires: retrain FROM THE STORE (no corpus dir involved)
    assert(IndexPolicy.maybeRetrain(spark, indexDir, 1.5))
    // detector re-armed: fresh baseline, zero appended epochs
    val after = IvfIndex.driftReport(spark, indexDir)
    assert(!after.retrain)
    assert(after.appendedRows === 0L)
    // no vector lost, no recovery residue, queries still serve a dense top-k
    val idsAfter = spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(idsAfter === idsBefore)
    val root = new java.io.File(indexDir).getParentFile
    assert(!root.listFiles().exists(_.getName.contains(".retrain-")),
      "retrain left staging/backup residue")
    val out = IvfIndex.topKIndexed(spark, indexDir)
    val shape = out.groupBy(col("query_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(_.getLong(1)).toSet
    assert(shape === Set(5L))
    // the NEW quantizer actually sees the drifted region: the shifted
    // vectors no longer sit far from every centroid
    val base = spark.read.parquet(s"$indexDir/baseline.parquet").head()
    assert(base.getLong(0) === idsBefore.size)
  }

  test("double-append and compaction leave query output identical") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = freshDir("dup")
    val cents = SimilarityOps.learnedCentRows(spark, sfDir)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    IvfIndex.buildIndex(spark, indexDir, cents, emb.filter(col("vec_id") % 2 === 0))
    IvfIndex.appendToIndex(spark, indexDir, batch)
    val before = rows(IvfIndex.topKIndexed(spark, indexDir))
    IvfIndex.appendToIndex(spark, indexDir, batch) // at-least-once re-delivery
    assert(rows(IvfIndex.topKIndexed(spark, indexDir)) === before)
    IvfIndex.compact(spark, indexDir)
    assert(rows(IvfIndex.topKIndexed(spark, indexDir)) === before)
    val eps = new java.io.File(s"$indexDir/cells.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch="))
    assert(eps.length === 1)
  }
}
