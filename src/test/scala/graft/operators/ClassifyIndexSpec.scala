package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Persisted-model discipline for the classifier counts family:
  * append ≡ rebuild (including a word whose counts straddle the
  * build/append boundary AND a class that first appears in the appended
  * epoch — both exact only because totals/vocabulary derive from the
  * summed counts), indexed ≡ inline, replay no-op. */
class ClassifyIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectPreds(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getAs[String]("true_lang"),
        r.getAs[String]("pred_lang"), r.getAs[Long]("score"),
        r.getAs[Long]("is_correct")))
      .toSet

  // "cat" counts straddle the epochs (doc 1 and doc 6); class "de" exists
  // only in the appended batch; docs 5/10/15 are the holdout split
  private val initial = Seq(
    (1L, "en", "cat dog cat"),
    (2L, "fr", "chat chien chat"),
    (5L, "en", "cat dog"),
    (10L, "fr", "chat noir"))
  private val appended = Seq(
    (6L, "en", "cat fish"),
    (7L, "de", "hund katze hund"),
    (15L, "de", "hund"))

  test("append ≡ rebuild across straddling words and a new class") {
    val full = docsDf(initial ++ appended)
    val rebuilt = tmpDir("graft-clf-rebuild")
    val grown = tmpDir("graft-clf-grown")
    ClassifyIndex.buildModel(spark, full, rebuilt)
    ClassifyIndex.buildModel(spark, docsDf(initial), grown)
    ClassifyIndex.appendToModel(spark, grown, docsDf(appended))

    val a = collectPreds(ClassifyIndex.scoreDocs(spark, full, rebuilt))
    val b = collectPreds(ClassifyIndex.scoreDocs(spark, full, grown))
    assert(a === b)
    // the appended class is servable: doc 15's "hund" predicts de
    val byId = b.map(t => t._1 -> t).toMap
    assert(byId(15L)._3 === "de")
    assert(byId(15L)._5 === 1L)
    assert(byId(5L)._3 === "en")
  }

  test("ledger covers holdout-only batches; replay adds no epoch") {
    val dir = tmpDir("graft-clf-ledger")
    ClassifyIndex.buildModel(spark, docsDf(initial), dir)
    // a batch carrying ONLY holdout docs: no counts, but ledgered
    val holdoutOnly = Seq((20L, "en", "dog dog"))
    ClassifyIndex.appendToModel(spark, dir, docsDf(holdoutOnly))
    val ids = ClassifyIndex.residentDocIds(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 5L, 10L, 20L))

    def epochs = new java.io.File(s"$dir/counts.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    assert(epochs === Set("epoch=0", "epoch=1"))
  }

  test("streamed model maintenance equals a one-shot build; replays are no-ops") {
    implicit val sql = spark.sqlContext
    val all = initial ++ appended
    val modelDir = tmpDir("graft-clf-stream") + "/m"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocStream.classifierModelMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "lang", "text"), modelDir)
    try {
      input.addData(initial(0), initial(1))
      q.processAllAvailable()
      input.addData(initial(2), initial(0)) // doc 1 re-delivered — skipped
      q.processAllAvailable()
      input.addData(initial(3))
      q.processAllAvailable()
      input.addData(appended: _*) // brand-new class arrives mid-stream
      q.processAllAvailable()
    } finally q.stop()

    val batchDir = tmpDir("graft-clf-batchb") + "/m"
    ClassifyIndex.buildModel(spark, docsDf(all), batchDir)
    val full = docsDf(all)
    assert(collectPreds(ClassifyIndex.scoreDocs(spark, full, modelDir)) ===
      collectPreds(ClassifyIndex.scoreDocs(spark, full, batchDir)))

    // replaying an applied batch adds no epoch
    def epochs = new java.io.File(s"$modelDir/counts.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    graft.streaming.DocStream.processClassifierModelBatch(
      spark, modelDir, docsDf(Seq(initial(2))))
    assert(epochs === before)
  }

  test("q_classify_freq_indexed ≡ inline q_classify_freq on a parquet corpus") {
    val dir = tmpDir("graft-clf-parity")
    docsDf(initial ++ appended)
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inline = collectPreds(QueryRegistry.byName("q_classify_freq").run(spark, dir))
    val indexed = collectPreds(
      QueryRegistry.byName("q_classify_freq_indexed").run(spark, dir))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }
}
