package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted-index discipline for the bottom-k quantile-sketch store:
  * append ≡ rebuild (including a source whose sample membership CHANGES —
  * appended docs must evict resident sample rows under the re-applied
  * rank filter), crashed-staging invisibility, streamed ≡ one-shot,
  * compaction identity, and indexed ≡ inline equality. */
class SketchIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (doc_id, source, n_chars); > K=64 docs in s0 so the store genuinely
  // prunes, and the appended batch hashes some ids into the bottom-64
  private def docsDf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "source", "n_chars")

  private val initial: Seq[(Long, String, Long)] =
    (1L to 80L).map(i => (i, "s0", 100L + i)) ++
      (200L to 209L).map(i => (i, "s1", 10L * i))
  private val appended: Seq[(Long, String, Long)] =
    (81L to 110L).map(i => (i, "s0", 500L + i)) ++
      (210L to 214L).map(i => (i, "s1", 10L * i))

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectEsts(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sample_m"),
          r.getAs[Long]("est_p50"), r.getAs[Long]("est_p90"),
          r.getAs[Long]("est_p99")))
      .toMap

  test("append ≡ rebuild, including sample eviction under the rank filter") {
    val full = docsDf(initial ++ appended)
    val rebuilt = tmpDir("graft-sketch-rebuild")
    val grown = tmpDir("graft-sketch-grown")
    SketchIndex.buildIndex(spark, full, rebuilt)
    SketchIndex.buildIndex(spark, docsDf(initial), grown)
    SketchIndex.appendToIndex(spark, grown, docsDf(appended))
    val a = collectEsts(SketchIndex.estimatesFromIndex(spark, rebuilt))
    val b = collectEsts(SketchIndex.estimatesFromIndex(spark, grown))
    assert(a === b)
    assert(b("s0")._1 === 110L)
    assert(b("s0")._2 === 64L) // still K after the merge prune
    assert(b("s1")._1 === 15L)
    assert(b("s1")._2 === 15L)
    // the appended docs really did enter the merged sample: estimates
    // must differ from the pre-append store (values 500+ shift p99)
    val pre = collectEsts(SketchIndex.estimatesFromIndex(spark,
      { val d = tmpDir("graft-sketch-pre"); SketchIndex.buildIndex(spark, docsDf(initial), d); d }))
    assert(pre("s0") !== b("s0"))
  }

  test("crashed staging dirs are invisible to readers") {
    val dir = tmpDir("graft-sketch-crash")
    SketchIndex.buildIndex(spark, docsDf(initial), dir)
    val before = collectEsts(SketchIndex.estimatesFromIndex(spark, dir))
    val junk = new java.io.File(s"$dir/sample.parquet/.epoch-99.tmp")
    assert(junk.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(junk.toString, "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(collectEsts(SketchIndex.estimatesFromIndex(spark, dir)) === before)
  }

  test("streamed maintenance equals a one-shot build; replays are no-ops") {
    implicit val sql = spark.sqlContext
    val indexDir = tmpDir("graft-sketch-stream") + "/i"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.DocStream.sketchMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "source", "n_chars"), indexDir)
    try {
      input.addData(initial.take(40): _*)
      q.processAllAvailable()
      input.addData((initial.drop(40) ++ initial.take(3)): _*) // re-delivery
      q.processAllAvailable()
      input.addData(appended: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batchDir = tmpDir("graft-sketch-batch") + "/i"
    SketchIndex.buildIndex(spark, docsDf(initial ++ appended), batchDir)
    assert(collectEsts(SketchIndex.estimatesFromIndex(spark, indexDir)) ===
      collectEsts(SketchIndex.estimatesFromIndex(spark, batchDir)))

    def epochs = new java.io.File(s"$indexDir/sample.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    graft.streaming.DocStream.processSketchBatch(
      spark, indexDir, docsDf(initial.take(5)))
    assert(epochs === before)
  }

  test("a duplicated epoch (crash-retry window) changes no read") {
    // simulates the crash between the sample/counts renames and the docs
    // rename: the retry re-appends the SAME batch as a duplicate epoch.
    // Both merges must absorb it — counts dedupe on the batch digest,
    // sample rows collapse on (source, doc_id) instead of eating slots.
    val once = tmpDir("graft-sketch-dup-once")
    SketchIndex.buildIndex(spark, docsDf(initial), once)
    SketchIndex.appendToIndex(spark, once, docsDf(appended))
    val twice = tmpDir("graft-sketch-dup-twice")
    SketchIndex.buildIndex(spark, docsDf(initial), twice)
    SketchIndex.appendToIndex(spark, twice, docsDf(appended))
    SketchIndex.appendToIndex(spark, twice, docsDf(appended)) // the retry
    val a = collectEsts(SketchIndex.estimatesFromIndex(spark, once))
    val b = collectEsts(SketchIndex.estimatesFromIndex(spark, twice))
    assert(a === b)
    assert(b("s0")._1 === 110L, "n_docs must not double-count")
    // and compaction of the duplicated store converges to the same reads
    SketchIndex.compact(spark, twice)
    assert(collectEsts(SketchIndex.estimatesFromIndex(spark, twice)) === a)
  }

  test("compaction preserves reads and collapses to one epoch") {
    val dir = tmpDir("graft-sketch-compact")
    SketchIndex.buildIndex(spark, docsDf(initial), dir)
    SketchIndex.appendToIndex(spark, dir, docsDf(appended.take(20)))
    SketchIndex.appendToIndex(spark, dir, docsDf(appended.drop(20)))
    val before = collectEsts(SketchIndex.estimatesFromIndex(spark, dir))
    SketchIndex.compact(spark, dir)
    assert(collectEsts(SketchIndex.estimatesFromIndex(spark, dir)) === before)
    Seq("sample", "counts", "docs").foreach { t =>
      val epochs = new java.io.File(s"$dir/$t.parquet").listFiles()
        .map(_.getName).filter(_.startsWith("epoch=")).toSet
      assert(epochs === Set("epoch=0"), t)
    }
  }

  test("q_quantile_sketch_indexed ≡ inline q_quantile_sketch on a parquet corpus") {
    val dir = tmpDir("graft-sketch-parity")
    docsDf(initial ++ appended)
      .withColumn("text", concat(lit("doc "), col("doc_id")))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inline = collectEsts(QueryRegistry.byName("q_quantile_sketch").run(spark, dir))
    val indexed = collectEsts(
      QueryRegistry.byName("q_quantile_sketch_indexed").run(spark, dir))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }
}
