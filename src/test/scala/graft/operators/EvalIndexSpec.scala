package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The persisted eval-shingle vocabulary ([[EvalIndex]]): indexed ≡
  * inline decontamination, append ≡ rebuild with replay invariance, and
  * the at-ingest cleaning lane. */
class EvalIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q_decontaminate_indexed ≡ q_decontaminate on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val a = QueryRegistry.byName("q_decontaminate").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_decontaminate_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("append ≡ rebuild; duplicate epochs and compaction are invariant") {
    val base = java.nio.file.Files.createTempDirectory("graft-evalidx").toString
    val evalDocs = Seq(
      (1L, "a b c d"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    val oneShot = s"$base/oneshot"
    EvalIndex.buildIndex(spark, evalDocs, oneShot)
    def vocab(d: String) = EvalIndex.shingles(spark, d)
      .collect().map(_.getString(0)).toSet
    val want = vocab(oneShot)
    assert(want === Set("a b c", "b c d", "p q r", "q r s", "r s t"))

    val inc = s"$base/inc"
    EvalIndex.buildIndex(spark, evalDocs.filter(col("doc_id") === 1L), inc)
    EvalIndex.appendToIndex(spark, inc, evalDocs.filter(col("doc_id") === 2L))
    assert(vocab(inc) === want)
    // crash-window duplicate epoch: distinct read-merge absorbs it
    EvalIndex.appendToIndex(spark, inc, evalDocs.filter(col("doc_id") === 2L))
    assert(vocab(inc) === want)
    EvalIndex.compact(spark, inc)
    val epochs = new java.io.File(s"$inc/shingles.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    assert(epochs === 1)
    assert(vocab(inc) === want)
  }

  test("streamed vocabulary + at-ingest cleaning ≡ the one-shot lane") {
    val base = java.nio.file.Files.createTempDirectory("graft-evalstream").toString
    val idx = s"$base/idx"
    // eval docs arrive over two batches (with a re-delivery)
    Seq(
      Seq((1L, "a b c d")),
      Seq((2L, "m n o"), (1L, "a b c d"))).foreach { b =>
      graft.streaming.DocStream.processEvalIndexBatch(
        spark, idx, b.toDF("doc_id", "text"))
    }
    assert(EvalIndex.residentDocIds(spark, idx).count() === 2L)
    // a train batch cleaned against the streamed store == cleaning
    // against the one-shot vocabulary of the same eval docs
    val train = Seq(
      (100L, "x y a b c z"), // leak at 3 → "x y z"
      (101L, "m n o"), // fully covered
      (102L, "u v w")).toDF("doc_id", "text")
    val got = TextOps.cleanAgainst(train, EvalIndex.shingles(spark, idx))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got === Map(
      100L -> ((3L, "x y z")),
      101L -> ((3L, "")),
      102L -> ((0L, "u v w"))))
  }

  test("decontaminateStream wiring emits cleaned batches through the query") {
    val base = java.nio.file.Files.createTempDirectory("graft-deconwire").toString
    val idx = s"$base/idx"
    EvalIndex.buildIndex(spark, Seq((1L, "a b c d")).toDF("doc_id", "text"), idx)
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = graft.streaming.DocStream.decontaminateStream(
      spark, input.toDF().toDF("doc_id", "text"), idx) { cleaned =>
      emitted ++= cleaned.collect().map(r =>
        (r.getLong(0), r.getLong(2), r.getString(3)))
      ()
    }
    try {
      input.addData((100L, "q a b c r"))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.toList === List((100L, 3L, "q r")))
  }
}
