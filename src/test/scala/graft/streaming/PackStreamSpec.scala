package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pack-at-ingest ([[graft.operators.PackIndex]]): the additive-counter
  * contract — in-order micro-batches reproduce the one-shot pack
  * manifest exactly; replays are no-ops; compaction preserves the
  * served manifest; out-of-order arrival packs at the tail
  * (as-of-arrival, documented). */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val allDocs =
    graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("text"))

  private def batchOf(lo: Long, hi: Long): DataFrame =
    allDocs.filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def served(indexDir: String): Set[String] =
    graft.operators.PackIndex.chunksFromIndex(spark, indexDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def oneShot(docs: DataFrame): Set[String] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-packref").toString
    graft.operators.PackIndex.buildIndex(spark, docs, tmp)
    served(tmp)
  }

  test("in-order streamed pack ≡ one-shot manifest; replay is a no-op; compact preserves") {
    val indexDir =
      java.nio.file.Files.createTempDirectory("graft-packstream").toString + "/idx"
    Seq((0L, 400L), (400L, 800L), (800L, Long.MaxValue)).foreach { case (lo, hi) =>
      DocStream.processPackBatch(spark, indexDir, batchOf(lo, hi))
    }
    val streamed = served(indexDir)
    assert(streamed === oneShot(allDocs),
      "in-order batches must reproduce the one-shot pack bit for bit")

    // replayed batch: resident-ledger anti-join empties it — no epoch
    def epochs = new java.io.File(s"$indexDir/manifest.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))
    val before = epochs
    DocStream.processPackBatch(spark, indexDir, batchOf(400L, 800L))
    assert(epochs === before, "replay must not append an epoch")
    assert(served(indexDir) === streamed)

    // compaction folds epochs without changing the served manifest
    graft.operators.PackIndex.compact(spark, indexDir)
    assert(epochs === 1)
    assert(served(indexDir) === streamed)
  }

  test("q_pack_chunks_indexed serving lane ≡ inline q_pack_chunks") {
    val dir = "/root/testdata/sf0.001"
    val inline = graft.QueryRegistry.byName("q_pack_chunks").run(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val indexed = graft.QueryRegistry.byName("q_pack_chunks_indexed").run(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(indexed === inline,
      "served manifest must be row-identical to the one-shot pack (same oracle)")
  }

  test("out-of-order arrival packs at the stream tail (as-of-arrival semantics)") {
    val indexDir =
      java.nio.file.Files.createTempDirectory("graft-packooo").toString + "/idx"
    // batch 2 arrives first: its docs claim offsets from 0; the late
    // batch 1 packs AFTER them — the documented loader semantics, so the
    // manifest diverges from the one-shot doc_id-order pack while both
    // remain valid contiguous streams
    DocStream.processPackBatch(spark, indexDir, batchOf(400L, 800L))
    DocStream.processPackBatch(spark, indexDir, batchOf(0L, 400L))
    val c = graft.operators.PackIndex.chunksFromIndex(spark, indexDir)
    val perSource = c.groupBy(col("source"))
      .agg(min(col("start_tok")).as("mn"), sum(col("n_toks")).as("tot"),
        max(col("start_tok") + col("n_toks")).as("end"))
    assert(perSource.filter(col("mn") =!= 0L || col("end") =!= col("tot")).count() === 0,
      "arrival-order pack still tiles [0, total) per source")
    assert(c.count() === batchOf(0L, 800L).count())
  }
}
