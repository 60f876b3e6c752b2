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
    for (tab <- Seq("bands.parquet", "vectors.parquet")) {
      assert(dirs(tab).filter(_.startsWith("epoch=")) === Set("epoch=0"))
      assert(!dirs(tab).exists(_.startsWith(".old-")), s"hidden olds left in $tab")
      assert(!dirs(tab).contains(".compact.tmp"))
    }
    // idempotent: compacting a compacted index changes nothing
    AnnIndex.compact(spark, indexDir)
    assert(rows(AnnIndex.topKIndexed(spark, indexDir)) === before)
    // and appends keep working after a compaction (next epoch = 1)
    AnnIndex.appendToIndex(spark, indexDir,
      emb.filter(col("vec_id") % 3 === 0).withColumn("vec_id", col("vec_id") + 100000))
    assert(dirs("bands.parquet").filter(_.startsWith("epoch=")) === Set("epoch=0", "epoch=1"))
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
