package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EmbedStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import EmbedStream._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 16-dim vectors (>= NumBands*BandBits = 12 components used for keys).
  // base2 is a tiny perturbation of base (same orthant, cosine ~1);
  // far flips the signs the band keys read (different orthant, low cosine).
  private val base = Seq.tabulate(16)(i => 1.0f + 0.01f * i)
  private val base2 = base.map(x => x * 1.001f)
  private val far = Seq.tabulate(16)(i => if (i % 2 == 0) -1.0f else 1.0f)

  test("streaming propose pairs same-orthant vectors, not different-orthant") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EmbDoc]
    val q = nearDupCandidates(spark, input.toDF()).toDF()
      .writeStream.format("memory").queryName("embcands")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EmbDoc(1L, ts("2024-01-01 10:00:00"), base),
        EmbDoc(2L, ts("2024-01-01 10:01:00"), base2),
        EmbDoc(3L, ts("2024-01-01 10:02:00"), far))
      q.processAllAvailable()
      // cross-batch: the bucket keeper survives into the next micro-batch
      input.addData(EmbDoc(4L, ts("2024-01-01 10:20:00"), base))
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT keeper_id, vec_id FROM embcands")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)), s"same-orthant pair expected: $got")
      assert(got.contains((1L, 4L)), s"cross-batch pair expected: $got")
      assert(!got.exists { case (k, d) => k == 3L || d == 3L },
        s"different-orthant vector must not pair: $got")
    } finally q.stop()
  }

  test("verifiedNearDups: exact cosine gates the proposed pairs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // corpus carries all vectors; mid shares base's orthant (so it IS
    // proposed) but its cosine to base is well under the 0.99 threshold
    val mid = Seq.tabulate(16)(i => if (i < 8) 5.0f else 0.1f)
    val corpus = Seq(
      (1L, base), (2L, base2), (3L, far), (5L, mid))
      .toDF("vec_id", "embedding")
    val input = MemoryStream[EmbDoc]
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = verifiedNearDups(spark, input.toDF(), corpus, 0.99) { verified =>
      got ++= verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    try {
      input.addData(
        EmbDoc(1L, ts("2024-01-01 10:00:00"), base),
        EmbDoc(2L, ts("2024-01-01 10:01:00"), base2),
        EmbDoc(3L, ts("2024-01-01 10:02:00"), far),
        EmbDoc(5L, ts("2024-01-01 10:03:00"), mid))
      q.processAllAvailable()
      assert(got.contains((1L, 2L)), s"near-identical vector must verify: $got")
      assert(!got.exists { case (k, d) => d == 5L || k == 5L },
        s"band collision with low cosine must be rejected by verify: $got")
      assert(!got.exists { case (k, d) => k == 3L || d == 3L }, s"got $got")
    } finally q.stop()
  }

  test("streamed ANN index maintenance equals a one-shot batch build") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 9 vectors: ids 0-6 near-parallel (same orthant, distinct cosines),
    // 7-8 in other orthants — queries are all ids (< NumQueries = 20)
    def vec(i: Long): Seq[Float] =
      if (i == 7L) Seq.tabulate(16)(j => if (j % 2 == 0) -1.0f else 1.0f)
      else if (i == 8L) Seq.tabulate(16)(j => if (j < 8) -2.0f else 0.5f)
      else Seq.tabulate(16)(j => (1.0f + 0.01f * j) * (1.0f + 0.003f * (i * j % 5)))
    def doc(i: Long) = EmbDoc(i, ts(f"2024-01-01 10:${i}%02d:00"), vec(i))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-annstream").toString + "/idx"
    val input = MemoryStream[EmbDoc]
    val q = annIndexMaintenanceStream(spark, input.toDF(), streamDir)
    try {
      input.addData(doc(0), doc(1), doc(2))
      q.processAllAvailable()
      input.addData(doc(3), doc(4), doc(2)) // 2 re-delivered — must be skipped
      q.processAllAvailable()
      input.addData(doc(5), doc(6), doc(7), doc(8))
      q.processAllAvailable()
    } finally q.stop()

    val batchDir = java.nio.file.Files.createTempDirectory("graft-annbatch").toString + "/idx"
    val all = (0L to 8L).map(i => (i, 0L, vec(i))).toDF("vec_id", "label", "embedding")
    graft.operators.AnnIndex.buildIndex(spark, all, batchDir)

    def rows(dir: String): Set[(Long, Long, Long)] =
      graft.operators.AnnIndex.topKIndexed(spark, dir).collect()
        .map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getLong(r.fieldIndex("neighbor_id")), r.getLong(r.fieldIndex("rank")))).toSet
    assert(rows(streamDir) === rows(batchDir))
    assert(rows(streamDir).nonEmpty)
    // the re-delivered vector was anti-joined away: one row per vec_id
    val ids = spark.read.parquet(s"$streamDir/vectors.parquet")
      .groupBy(col("vec_id")).count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ids.toMap.values.toSet === Set(1L))
    assert(ids.map(_._1).toSet === (0L to 8L).toSet)

    // replaying an already-applied batch is a no-op (no new epoch)
    def epochs = new java.io.File(s"$streamDir/bands.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    val replay = Seq(doc(3), doc(4)).map(d => (d.vec_id, d.ts, d.embedding))
      .toDF("vec_id", "ts", "embedding")
    EmbedStream.processAnnIndexBatch(spark, streamDir, replay)
    assert(epochs === before)
  }

  test("streamed IVF index maintenance equals a one-shot batch build") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def vec(i: Long): Seq[Float] =
      if (i == 7L) Seq.tabulate(16)(j => if (j % 2 == 0) -1.0f else 1.0f)
      else if (i == 8L) Seq.tabulate(16)(j => if (j < 8) -2.0f else 0.5f)
      else Seq.tabulate(16)(j => (1.0f + 0.01f * j) * (1.0f + 0.003f * (i * j % 5)))
    def doc(i: Long) = EmbDoc(i, ts(f"2024-01-01 10:${i}%02d:00"), vec(i))
    // frozen 2-cell quantizer: training is a batch decision, the stream
    // only appends against it
    val cents: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq.tabulate(16)(j => 1.0 + 0.01 * j),
      1L -> Seq.tabulate(16)(j => if (j % 2 == 0) -1.0 else 1.0))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString + "/idx"
    graft.operators.IvfIndex.buildIndex(spark, streamDir, cents,
      Seq(0L, 1L, 2L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val input = MemoryStream[EmbDoc]
    val q = ivfIndexMaintenanceStream(spark, input.toDF(), streamDir)
    try {
      input.addData(doc(3), doc(4), doc(2)) // 2 re-delivered — must be skipped
      q.processAllAvailable()
      input.addData(doc(5), doc(6), doc(7), doc(8))
      q.processAllAvailable()
    } finally q.stop()

    val batchDir = java.nio.file.Files.createTempDirectory("graft-ivfbatch").toString + "/idx"
    graft.operators.IvfIndex.buildIndex(spark, batchDir, cents,
      (0L to 8L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))

    def rows(dir: String): Set[(Long, Long, Long)] =
      graft.operators.IvfIndex.topKIndexed(spark, dir).collect()
        .map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getLong(r.fieldIndex("neighbor_id")), r.getLong(r.fieldIndex("rank")))).toSet
    assert(rows(streamDir) === rows(batchDir))
    assert(rows(streamDir).nonEmpty)
    // re-delivered vector anti-joined away: one cells row per vec_id
    val ids = spark.read.parquet(s"$streamDir/cells.parquet")
      .groupBy(org.apache.spark.sql.functions.col("vec_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ids.toMap.values.toSet === Set(1L))
    assert(ids.map(_._1).toSet === (0L to 8L).toSet)
    // replaying an applied batch is a no-op (no new epoch)
    def epochs = new java.io.File(s"$streamDir/cells.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    EmbedStream.processIvfIndexBatch(spark, streamDir,
      Seq(3L, 4L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    assert(epochs === before)
    // drift bookkeeping rode the stream: appended epochs recorded stats
    val drift = graft.operators.IvfIndex.driftReport(spark, streamDir)
    assert(drift.appendedRows === 6L)
  }

  test("stream band keys equal the batch sign-orthant construction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the first NumBands*BandBits sign bits, sliced into bands, must match
    // a direct batch computation over the same vectors
    val df = Seq((1L, base), (3L, far)).toDF("vec_id", "embedding")
    val streamKeys = (0 until NumBands).map { b =>
      df.select(col("vec_id"), (0 until BandBits).map { j =>
        when(element_at(col("embedding"), b * BandBits + j + 1)
          .cast("double") > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as("k")).collect().map(r => (r.getLong(0), b) -> r.getLong(1))
    }.flatten.toMap
    // base: all 12 leading components positive → every band key = 15;
    // far: components alternate -,+ → bits 1 and 3 set → key 10
    (0 until NumBands).foreach { b =>
      assert(streamKeys((1L, b)) === 15L)
      assert(streamKeys((3L, b)) === 10L)
    }
  }
}
