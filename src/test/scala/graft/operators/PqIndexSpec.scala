package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession, Tables}

/** Persisted-index discipline for the PQ code store: indexed ≡ inline,
  * frozen-codebook append ≡ rebuild, re-delivered epochs absorbed,
  * crashed staging invisible. */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/i"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  private def emb = Tables.table(spark, sfDir, "embeddings")
  private def queries = emb.filter(col("vec_id") < SimilarityOps.NumQueries)

  test("q_ann_pq_indexed ≡ inline q_ann_pq") {
    val inline = rows(QueryRegistry.byName("q_ann_pq").run(spark, sfDir))
    val indexed = rows(QueryRegistry.byName("q_ann_pq_indexed").run(spark, sfDir))
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }

  test("frozen-codebook append ≡ rebuild; re-delivered epochs are absorbed") {
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    val grown = tmpDir("graft-pq-grown")
    PqIndex.buildIndex(spark, a, grown)
    PqIndex.appendToIndex(spark, grown, b)

    // reference: full corpus under the SAME frozen quantizer
    val rebuilt = tmpDir("graft-pq-rebuilt")
    PqIndex.buildIndex(spark, emb, rebuilt,
      Some(PqIndex.readCodebook(spark, grown)))
    val got = rows(PqIndex.topKIndexed(spark, queries, grown))
    assert(got === rows(PqIndex.topKIndexed(spark, queries, rebuilt)))

    // replaying the same batch adds rows the code-level distinct absorbs
    PqIndex.appendToIndex(spark, grown, b)
    assert(rows(PqIndex.topKIndexed(spark, queries, grown)) === got)
    // the ledger would have told a replay-safe caller to skip it
    assert(PqIndex.residentVecIds(spark, grown).count() === emb.count())
  }

  test("streamed code-store maintenance equals a frozen-codebook build") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val streamDir = tmpDir("graft-pq-stream")
    PqIndex.buildIndex(spark, emb.filter(col("vec_id") % 3 =!= 0), streamDir)
    val bRows = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, b2) = bRows.splitAt(bRows.length / 2)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EmbedStream.pqIndexMaintenanceStream(
      spark, input.toDF().toDF("vec_id", "embedding"), streamDir)
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData((b2 ++ b1.take(1)).toSeq: _*) // one re-delivered vector
      q.processAllAvailable()
    } finally q.stop()

    val rebuilt = tmpDir("graft-pq-streamref")
    PqIndex.buildIndex(spark, emb, rebuilt,
      Some(PqIndex.readCodebook(spark, streamDir)))
    assert(rows(PqIndex.topKIndexed(spark, queries, streamDir)) ===
      rows(PqIndex.topKIndexed(spark, queries, rebuilt)))

    // replaying an applied batch adds no epoch
    def epochs = new java.io.File(s"$streamDir/codes.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val before = epochs
    graft.streaming.EmbedStream.processPqIndexBatch(
      spark, streamDir, b1.toSeq.toDF("vec_id", "embedding"))
    assert(epochs === before)
  }

  test("crashed staging dirs are invisible to readers") {
    val dir = tmpDir("graft-pq-crash")
    PqIndex.buildIndex(spark, emb, dir)
    val before = rows(PqIndex.topKIndexed(spark, queries, dir))
    val junk = new java.io.File(s"$dir/codes.parquet/.epoch-99.tmp")
    assert(junk.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(junk.toString, "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(rows(PqIndex.topKIndexed(spark, queries, dir)) === before)
  }
}
