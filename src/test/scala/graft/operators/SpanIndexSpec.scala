package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted-index discipline for the span-dedup gram-count family:
  * append ≡ rebuild (including a duplicate whose two occurrences straddle
  * the build/append boundary — flagged only if readers sum counts across
  * epochs BEFORE the ≥2 filter), crashed-staging invisibility, and
  * indexed ≡ inline equality. */
class SpanIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectScores(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_toks"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("dup_permille")))
      .toSet

  // r1..r8 occurs ONCE in the initial corpus and once in the appended
  // batch — a duplicate only when epochs are summed before filtering
  private val initial = Seq(
    (1L, "r1 r2 r3 r4 r5 r6 r7 r8 a1 a2"),
    (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b1 b2 b3 b4 b5 b6 b7 b8 b9"))
  private val appended = Seq(
    (3L, "c0 r1 r2 r3 r4 r5 r6 r7 r8 c1"))

  test("append ≡ rebuild, including a duplicate straddling the epoch boundary") {
    val full = docsDf(initial ++ appended)
    val rebuilt = tmpDir("graft-span-rebuild")
    val grown = tmpDir("graft-span-grown")
    SpanIndex.buildIndex(spark, full, rebuilt)
    SpanIndex.buildIndex(spark, docsDf(initial), grown)
    SpanIndex.appendToIndex(spark, grown, docsDf(appended))

    val a = collectScores(SpanIndex.scoreDocs(spark, full, rebuilt))
    val b = collectScores(SpanIndex.scoreDocs(spark, full, grown))
    assert(a === b)
    // the straddling run IS flagged: doc 1 and doc 3 both carry the span
    val byId = b.map(t => t._1 -> t).toMap
    assert(byId(1L) === ((1L, 10L, 1L, 8L, 800L)))
    assert(byId(3L) === ((3L, 10L, 1L, 8L, 800L)))
    // doc 2's within-doc repetition: dup windows at pos {1,2} and {10,11}
    // merge into the two ADJACENT (non-overlapping) islands [1,9], [10,18]
    assert(byId(2L)._3 === 2L)
    assert(byId(2L)._4 === 18L)
  }

  test("membership ledger accumulates across epochs") {
    val dir = tmpDir("graft-span-ledger")
    SpanIndex.buildIndex(spark, docsDf(initial), dir)
    SpanIndex.appendToIndex(spark, dir, docsDf(appended))
    val ids = SpanIndex.residentDocIds(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L))
  }

  test("crashed staging dirs are invisible to readers") {
    val dir = tmpDir("graft-span-crash")
    val full = docsDf(initial ++ appended)
    SpanIndex.buildIndex(spark, full, dir)
    val before = collectScores(SpanIndex.scoreDocs(spark, full, dir))
    // a writer that died mid-publish leaves only a dot-prefixed tmp
    val junk = new java.io.File(s"$dir/grams.parquet/.epoch-99.tmp")
    assert(junk.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(junk.toString, "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    val after = collectScores(SpanIndex.scoreDocs(spark, full, dir))
    assert(after === before)
  }

  test("streamed index maintenance equals a one-shot build; replays are no-ops") {
    implicit val sql = spark.sqlContext
    val all = initial ++ appended
    val indexDir =
      java.nio.file.Files.createTempDirectory("graft-span-stream").toString + "/i"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.spanIndexMaintenanceStream(
      spark, input.toDF().toDF("doc_id", "text"), indexDir)
    try {
      input.addData(initial(0))
      q.processAllAvailable()
      input.addData(initial(1), initial(0)) // doc 1 re-delivered — skipped
      q.processAllAvailable()
      input.addData(appended(0))
      q.processAllAvailable()
    } finally q.stop()

    val batchDir =
      java.nio.file.Files.createTempDirectory("graft-span-batch").toString + "/i"
    SpanIndex.buildIndex(spark, docsDf(all), batchDir)
    val full = docsDf(all)
    assert(collectScores(SpanIndex.scoreDocs(spark, full, indexDir)) ===
      collectScores(SpanIndex.scoreDocs(spark, full, batchDir)))
    // the straddling r-run (doc 1 in batch 1, doc 3 in batch 3) is caught
    val byId = collectScores(SpanIndex.scoreDocs(spark, full, indexDir))
      .map(t => t._1 -> t).toMap
    assert(byId(3L)._3 === 1L)

    // replaying an applied batch adds no epoch
    def epochs = new java.io.File(s"$indexDir/grams.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    graft.streaming.DocStream.processSpanIndexBatch(
      spark, indexDir, docsDf(Seq(initial(1))))
    assert(epochs === before)
  }

  test("q_substring_dedup_indexed ≡ inline q_substring_dedup on a parquet corpus") {
    val dir = tmpDir("graft-span-parity")
    docsDf(initial ++ appended)
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inline = collectScores(QueryRegistry.byName("q_substring_dedup").run(spark, dir))
    val indexed = collectScores(
      QueryRegistry.byName("q_substring_dedup_indexed").run(spark, dir))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }
}
