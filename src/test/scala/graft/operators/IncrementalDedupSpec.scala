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

  test("appendToIndex ≡ full rebuild over the union — index contents AND run output") {
    val docs = Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(IncrementalDedup.bucketOf(col("doc_id")) < 80)
    val b1 = docs.filter(IncrementalDedup.bucketOf(col("doc_id")) >= 80 &&
      IncrementalDedup.bucketOf(col("doc_id")) < 90)
    val b2 = docs.filter(IncrementalDedup.bucketOf(col("doc_id")) >= 90)

    val appended = Files.createTempDirectory("graft-index-app").toString + "/idx"
    IncrementalDedup.buildIndex(corpus, appended)
    IncrementalDedup.appendToIndex(spark, appended, b1)
    val rebuilt = Files.createTempDirectory("graft-index-reb").toString + "/idx"
    IncrementalDedup.buildIndex(corpus.unionByName(b1), rebuilt)

    // index tables must be EXACTLY equal as row multisets — the append is a
    // maintenance path, not an approximation
    def rowsOf(dir: String, t: String): Map[Seq[Any], Long] =
      spark.read.parquet(s"$dir/$t.parquet").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (t <- Seq("text_shingles", "shingle_df", "texts", "members"))
      assert(rowsOf(appended, t) === rowsOf(rebuilt, t), s"table $t diverged")

    // and a batch run against either index is identical (old side = corpus ∪ b1)
    val oldAll = IncrementalDedup.bucketOf(col("doc_id")) < 100
    val viaAppend = pairs(IncrementalDedup.run(spark, appended, b2, oldAll))
    val viaRebuild = pairs(IncrementalDedup.run(spark, rebuilt, b2, oldAll))
    assert(viaAppend === viaRebuild)
    assert(viaAppend.nonEmpty)
  }

  test("appendToIndex corrects texts whose shingles the batch pushes over the df cap") {
    import spark.implicits._
    // corpus: 60 distinct 5-token docs (shingle df << cap); batch: 49 copies
    // of one of them — pushing ITS shingles' copy-weighted df from 1 to 50
    // (still ≤ cap) for one fixture, and 50 more copies over the cap for a
    // second append. The capped shingle count n0 of the shared text must
    // drop to 0 only after the cap is actually crossed.
    val mk = (i: Long) => (i, s"alpha beta gamma delta tok$i")
    val corpus = spark.createDataFrame((0L until 60L).map(mk)).toDF("doc_id", "text")
    val shared = corpus.filter($"doc_id" === 0L).select($"text").as[String].head()
    val dir = Files.createTempDirectory("graft-index-cap").toString + "/idx"
    IncrementalDedup.buildIndex(corpus, dir)
    def n0Of: Long = spark.read.parquet(s"$dir/texts.parquet")
      .filter(xxhash64(lit(shared)) === $"tkey").select($"n0").as[Long].head()
    // "alpha beta gamma"/"beta gamma delta" are shared by all 60 docs —
    // already over-cap at build — so the shared text's n0 counts exactly
    // its one unique shingle "gamma delta tok0"
    val before = n0Of
    assert(before === 1L)
    // +49 copies: the unique shingle's copy-weighted df = 50 = cap → n0 kept
    IncrementalDedup.appendToIndex(spark, dir,
      spark.createDataFrame((1000L until 1049L).map(i => (i, shared))).toDF("doc_id", "text"))
    assert(n0Of === before)
    // +1 more copy: df = 51 crosses the cap → the resident text's n0 drops
    IncrementalDedup.appendToIndex(spark, dir,
      spark.createDataFrame(Seq((2000L, shared))).toDF("doc_id", "text"))
    assert(n0Of === before - 1L)
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
