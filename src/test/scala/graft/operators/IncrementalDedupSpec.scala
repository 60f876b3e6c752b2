package graft.operators

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("old_id")),
      r.getLong(r.fieldIndex("new_id")),
      r.getDouble(r.fieldIndex("jaccard")))).toSet

  test("indexed run matches the one-shot q_dedup_incremental exactly") {
    val oneShot = graft.QueryRegistry.byName("q_dedup_incremental").run(spark, sfDir)
    val indexed = graft.QueryRegistry.byName("q_dedup_incremental_indexed").run(spark, sfDir)
    assert(pairs(indexed) === pairs(oneShot))
    assert(pairs(indexed).nonEmpty) // fixture actually exercises the operator
  }

  test("run phase plan reads only the index — no corpus document scan") {
    val docs = Tables.table(spark, sfDir, "documents")
    val indexDir = Files.createTempDirectory("graft-index").toString
    IncrementalDedup.buildIndex(
      docs.filter(IncrementalDedup.bucketOf(col("doc_id")) < 90), indexDir)
    // batch as an in-memory relation: every file scan in the run plan must
    // then point into the index — corpus parquet is structurally absent
    val batchRows = docs.filter(IncrementalDedup.bucketOf(col("doc_id")) >= 90)
      .select("doc_id", "text").collect().toSeq
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(batchRows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val out = IncrementalDedup.run(spark, indexDir, batch)
    // collect file relations from the optimized logical plan (the executed
    // plan hides behind AdaptiveSparkPlanExec until execution)
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
    // and the result is still the full contract
    assert(pairs(out) ===
      pairs(graft.QueryRegistry.byName("q_dedup_incremental").run(spark, sfDir)))
  }

  test("corpus text is never re-read: tampered corpus text cannot change a run") {
    val docs = Tables.table(spark, sfDir, "documents")
    val indexDir = Files.createTempDirectory("graft-index-tamper").toString
    IncrementalDedup.buildIndex(
      docs.filter(IncrementalDedup.bucketOf(col("doc_id")) < 90), indexDir)
    val batch = docs.filter(IncrementalDedup.bucketOf(col("doc_id")) >= 90)
    val before = pairs(IncrementalDedup.run(spark, indexDir, batch))
    // garble every resident document's text on disk; batch rows unchanged
    val tamperedDir = Files.createTempDirectory("graft-tampered").toString
    docs.withColumn("text",
        when(IncrementalDedup.bucketOf(col("doc_id")) < 90,
          concat(lit("GARBLED NOISE TOKENS "), col("doc_id").cast("string")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$tamperedDir/documents.parquet")
    val tamperedBatch = spark.read.parquet(s"$tamperedDir/documents.parquet")
      .filter(IncrementalDedup.bucketOf(col("doc_id")) >= 90)
    val after = pairs(IncrementalDedup.run(spark, indexDir, tamperedBatch))
    assert(after === before)
  }
}
