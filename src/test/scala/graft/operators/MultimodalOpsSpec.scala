package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Seq((1L, "abcdefghij"), (2L, "0123"))
    .toDF("doc_id", "s")
    .select(col("doc_id"), encode(col("s"), "UTF-8").as("payload"))

  test("frame sampling keeps every Nth fixed-size chunk") {
    val frames = MultimodalOps.frameSample(media, frameBytes = 4, every = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(x => (x._1, x._2))
    // doc 1: 10 bytes → frames [abcd, efgh, ij]; keep idx 0 and 2
    // doc 2: 4 bytes → frames [0123]; keep idx 0
    assert(frames.toSeq === Seq((1L, 0, "abcd"), (1L, 2, "ij"), (2L, 0, "0123")))
  }

  test("resize decimates frames to the target byte count") {
    val frames = MultimodalOps.frameSample(media, frameBytes = 8, every = 1)
    val resized = MultimodalOps.resize(frames.filter(col("doc_id") === 1 && col("frame_idx") === 0), 4)
      .collect().map(r => new String(r.getAs[Array[Byte]]("resized"), "UTF-8"))
    // 8-byte frame "abcdefgh" strided to 4 bytes: positions 0,2,4,6
    assert(resized.toSeq === Seq("aceg"))
  }

  test("batched feature extraction preserves rows and feature shape") {
    val out = MultimodalOps.extractFeatures(media)
    assert(out.count() === 2)
    val f = out.orderBy("doc_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")))
    assert(f.forall(_.length === MultimodalOps.FeatureDim))
    // deterministic: same input → same features
    val again = MultimodalOps.extractFeatures(media)
      .orderBy("doc_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")))
    assert(f.toSeq === again.toSeq)
  }

  test("stub features are exact per-residue byte sums (the oracle contract)") {
    val f = MultimodalOps.extractFeatures(media)
      .orderBy("doc_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")))
    // "abcdefghij": residue 0 ← 'a'(97) + 'i'(105) = 202; residue 1 ← 'b'+'j' = 204
    assert(f(0)(0) === 202f && f(0)(1) === 204f)
    // "0123": bytes 48..51 land one per residue 0..3, rest zero
    assert(f(1).toSeq === Seq(48f, 49f, 50f, 51f, 0f, 0f, 0f, 0f))
  }
}
