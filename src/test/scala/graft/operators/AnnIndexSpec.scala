package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("query_id")),
      r.getLong(r.fieldIndex("neighbor_id")),
      r.getLong(r.fieldIndex("rank")))).toSet

  test("indexed lane is row-identical to the inline portable LSH lane") {
    val inline = graft.QueryRegistry.byName("q_ann_lsh_portable").run(spark, sfDir)
    val indexed = graft.QueryRegistry.byName("q_ann_lsh_indexed").run(spark, sfDir)
    assert(rows(indexed) === rows(inline))
    assert(rows(indexed).nonEmpty)
  }

  test("appendToIndex ≡ full rebuild over the union — query output identical") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val a = emb.filter(col("vec_id") % 10 < 8)
    val b = emb.filter(col("vec_id") % 10 >= 8)

    val appended = Files.createTempDirectory("graft-ann-app").toString + "/idx"
    AnnIndex.buildIndex(spark, a, appended)
    AnnIndex.appendToIndex(spark, appended, b)
    val rebuilt = Files.createTempDirectory("graft-ann-reb").toString + "/idx"
    AnnIndex.buildIndex(spark, emb, rebuilt)

    assert(rows(AnnIndex.topKIndexed(spark, appended)) ===
      rows(AnnIndex.topKIndexed(spark, rebuilt)))
    // appends landed as separate epochs (O(batch) publish, not a rewrite)
    val epochs = new java.io.File(s"$appended/bands.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq === Seq("epoch=0", "epoch=1"))
  }

  test("query plan reads only the index — embeddings parquet structurally absent") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = Files.createTempDirectory("graft-ann-plan").toString + "/idx"
    AnnIndex.buildIndex(spark, emb, indexDir)
    val out = AnnIndex.topKIndexed(spark, indexDir)
    val scans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.contains(new java.io.File(indexDir).getName)),
      s"unexpected non-index scans: ${scans.filterNot(_.contains(indexDir))}")
  }

  test("compact folds every epoch into one with identical query output") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = Files.createTempDirectory("graft-ann-compact").toString + "/idx"
    AnnIndex.buildIndex(spark, emb.filter(col("vec_id") % 3 === 0), indexDir)
    AnnIndex.appendToIndex(spark, indexDir, emb.filter(col("vec_id") % 3 === 1))
    AnnIndex.appendToIndex(spark, indexDir, emb.filter(col("vec_id") % 3 === 2))
    val before = rows(AnnIndex.topKIndexed(spark, indexDir))
    def dirs(tab: String) = new java.io.File(s"$indexDir/$tab").listFiles()
      .map(_.getName).toSet
    assert(dirs("bands.parquet").count(_.startsWith("epoch=")) === 3)

    AnnIndex.compact(spark, indexDir)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    // publish-before-delete: the consolidated copy lands as a FRESH epoch
    // (max+1 = 3 here), never by hiding the olds first
    for (tab <- Seq("bands.parquet", "vectors.parquet")) {
      assert(dirs(tab).filter(_.startsWith("epoch=")) === Set("epoch=3"))
      assert(!dirs(tab).exists(_.startsWith(".old-")), s"hidden olds left in $tab")
      assert(!dirs(tab).contains(".compact.tmp"))
    }
    // idempotent: compacting a compacted index changes nothing
    AnnIndex.compact(spark, indexDir)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    // and appends keep working after a compaction (next epoch = max+1)
    AnnIndex.appendToIndex(spark, indexDir,
      emb.filter(col("vec_id") % 3 === 0).withColumn("vec_id", col("vec_id") + 100000))
    assert(dirs("bands.parquet").filter(_.startsWith("epoch=")).size === 2)
  }

  test("compact publish window and crash-rerun lose no data") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = Files.createTempDirectory("graft-ann-cwin").toString + "/idx"
    AnnIndex.buildIndex(spark, emb.filter(col("vec_id") % 2 === 0), indexDir)
    AnnIndex.appendToIndex(spark, indexDir, emb.filter(col("vec_id") % 2 === 1))
    val before = rows(AnnIndex.topKIndexed(spark, indexDir))

    // simulate a crash BETWEEN publish and old-epoch deletion: run a real
    // compact, then restore copies of the old epochs beside the
    // consolidated one — exactly the on-disk state of that window
    val backup = Files.createTempDirectory("graft-ann-cwin-bak").toString
    for (tab <- Seq("bands.parquet", "vectors.parquet")) {
      val src = new java.io.File(s"$indexDir/$tab")
      val dst = new java.io.File(s"$backup/$tab")
      org.apache.commons.io.FileUtils.copyDirectory(src, dst)
    }
    AnnIndex.compact(spark, indexDir)
    for (tab <- Seq("bands.parquet", "vectors.parquet");
         ep <- new java.io.File(s"$backup/$tab").listFiles()
           if ep.getName.startsWith("epoch="))
      org.apache.commons.io.FileUtils.copyDirectory(
        ep, new java.io.File(s"$indexDir/$tab/${ep.getName}"))

    // mid-window reads see old + consolidated epochs (duplicate rows) —
    // the rescore dedup keeps query output identical
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    // re-running compact from the crashed state converges losslessly
    AnnIndex.compact(spark, indexDir)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    val eps = new java.io.File(s"$indexDir/bands.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch="))
    assert(eps.length === 1)
  }

  test("double-appending a batch leaves query output identical") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = Files.createTempDirectory("graft-ann-dup").toString + "/idx"
    val batch = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.buildIndex(spark, emb.filter(col("vec_id") % 2 === 0), indexDir)
    AnnIndex.appendToIndex(spark, indexDir, batch)
    val before = rows(AnnIndex.topKIndexed(spark, indexDir))
    // the same batch delivered twice (at-least-once upstream): band AND
    // vector rows duplicate, but the rescore dedup keeps the ranking exact
    AnnIndex.appendToIndex(spark, indexDir, batch)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    // and compaction absorbs the duplicates (row set, deduplicated)
    AnnIndex.compact(spark, indexDir)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
  }

  test("crashed append staging dir is invisible to readers") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val indexDir = Files.createTempDirectory("graft-ann-crash").toString + "/idx"
    AnnIndex.buildIndex(spark, emb, indexDir)
    val before = rows(AnnIndex.topKIndexed(spark, indexDir))
    // simulate a crash mid-append: a populated staging dir that never got
    // renamed — dot-prefixed, so Spark's file listing must skip it
    val staging = new java.io.File(s"$indexDir/bands.parquet/.epoch-1.tmp")
    assert(staging.mkdirs())
    val junk = new java.io.File(staging, "part-junk.parquet")
    Files.write(junk.toPath, Array[Byte](1, 2, 3))
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
  }
}
