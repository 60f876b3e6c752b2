package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.{IvfIndex, LabelOps}

/** Ingest-time auto-labeling ([[DocStream.pseudoLabelStream]]): incoming
  * vectors pseudo-labeled by the persisted IVF store's kNN vote, output
  * appended as epochs of a single-table store. Pins: serve correctness on
  * exact copies (the rank-1 neighbor IS the source vector), one output
  * row per input with explicit abstentions, replay ≡ one-shot, and the
  * serve path's read-only contract against the index. */
class PseudoLabelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.table(spark, dir, "embeddings")

  /** Exact copies of corpus vectors under fresh ids ≥ 10^6 — the
    * strongest deterministic probe: each copy's nearest store member is
    * its own source at cosine 1. */
  private def copies(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    emb.filter(col("vec_id").isin(ids: _*))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))

  test("serve on exact copies: the rank-1 neighbor is the source vector, " +
      "and the predicted label matches the source's cell-majority vote") {
    val store = IvfIndex.ensureIndex(spark, dir)
    val batch = copies(Seq(3L, 17L, 42L, 101L))
    val topk = LabelOps.serveTopkFromStore(spark, store, batch)
    val r1 = topk.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (src <- Seq(3L, 17L, 42L, 101L))
      assert(r1(src + 1000000L) === src,
        s"copy of $src must find its source at rank 1 (cosine 1)")
    val pred = LabelOps.pseudoLabels(spark, dir, store, batch)
    assert(pred.count() === 4)
    assert(pred.filter(col("pred_label") === -1).count() === 0,
      "copies of resident vectors can never abstain")
    val labels = emb.select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(pred.collect().forall(r => labels.contains(r.getInt(1))))
  }

  test("stream: two batches land as two epochs, a replayed batch is a " +
      "no-op, and serving writes NOTHING into the index store") {
    val store = IvfIndex.ensureIndex(spark, dir)
    def storeSnapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(store))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = storeSnapshot()
    val out = java.nio.file.Files.createTempDirectory("graft-pseudo").toString

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Seq[Float])]
    val q = DocStream.pseudoLabelStream(
      spark, in.toDF().toDF("vec_id", "embedding"), dir, out)
    try {
      def rowsOf(vecIds: Seq[Long]) = emb.filter(col("vec_id").isin(vecIds: _*))
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

      in.addData(rowsOf(Seq(1L, 2L, 3L)))
      q.processAllAvailable()
      in.addData(rowsOf(Seq(4L, 5L)))
      q.processAllAvailable()
      val labels = spark.read.parquet(s"$out/pseudo_labels.parquet")
      assert(labels.count() === 5)
      assert(labels.select(col("vec_id")).distinct().count() === 5)
      val epochs = new java.io.File(s"$out/pseudo_labels.parquet").listFiles()
        .map(_.getName).filter(_.startsWith("epoch=")).sorted.toSeq
      assert(epochs === Seq("epoch=0", "epoch=1"))

      // replay batch 2 (redelivery): resident anti-join absorbs it
      in.addData(rowsOf(Seq(4L, 5L)))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/pseudo_labels.parquet").count() === 5,
        "a redelivered batch must re-label nothing")
      assert(new java.io.File(s"$out/pseudo_labels.parquet").listFiles()
        .map(_.getName).count(_.startsWith("epoch=")) === 2)

      assert(storeSnapshot() === before,
        "the serve path must not write a byte into the index store")
    } finally q.stop()
  }

  test("intra-batch key dedup: a redelivered vec_id with DIFFERENT " +
      "embedding bytes still publishes exactly one row for that key") {
    // distinct() over (vec_id, embedding) would pass both variants through
    // to the epoch write, breaking the store's one-row-per-vec_id
    // invariant; dedup must be on the key alone
    val out = java.nio.file.Files.createTempDirectory("graft-pseudo-dup").toString
    val base = copies(Seq(7L, 8L))
    val corrupted = base.filter(col("vec_id") === 1000007L)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    DocStream.processPseudoLabelBatch(spark, dir, out,
      base.unionAll(corrupted))
    val rows = spark.read.parquet(s"$out/pseudo_labels.parquet")
    assert(rows.count() === 2, "one row per distinct vec_id")
    assert(rows.select(col("vec_id")).distinct().count() === 2)
  }

  test("takedown: the registered Rewrite discipline drops exactly the " +
      "victims' label rows in one atomic folded rewrite; replay is a " +
      "no-op and a missing store is skipped clean") {
    val out = java.nio.file.Files.createTempDirectory("graft-pseudo-td").toString
    DocStream.processPseudoLabelBatch(spark, dir, out,
      copies(Seq(1L, 2L, 3L, 4L, 5L)))
    assert(graft.IndexCatalog.detectFamily(spark, out) === "pseudo-labels",
      "the output store must detect as its registered family")
    val victims = Seq(1000002L, 1000004L).toDF("doc_id")
    val res = graft.operators.Takedown.sweep(spark, victims, Seq(out))
    assert(res.map(_.action) === Seq("deleted"))
    val left = spark.read.parquet(s"$out/pseudo_labels.parquet")
    assert(left.select(col("vec_id")).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1000001L, 1000003L, 1000005L))
    assert(new java.io.File(s"$out/pseudo_labels.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch=")) === 1,
      "the rewrite folds history to one epoch")
    // replayed request: same result, still one epoch, no residue
    graft.operators.Takedown.sweep(spark, victims, Seq(out))
    assert(spark.read.parquet(s"$out/pseudo_labels.parquet").count() === 3)
    // a redelivered stream batch must not resurrect the deleted rows'
    // ids... it MAY relabel them (they are no longer resident — exactly
    // the takedown-then-reingest semantics every tombstone family has),
    // so pin only that the delete left no pending state for it to trip on
    DocStream.processPseudoLabelBatch(spark, dir, out, copies(Seq(5L)))
    assert(spark.read.parquet(s"$out/pseudo_labels.parquet").count() === 3,
      "resident id 1000005 is absorbed by the anti-join")
  }

  test("a batch of far-out vectors still gets one row each (abstention " +
      "only when no probed cell holds any member — here cells are " +
      "label-trained and nonempty, so the vote lands)") {
    val store = IvfIndex.ensureIndex(spark, dir)
    // vectors outside the corpus distribution: all-positive constants
    val odd = Seq((2000001L, Seq.fill(64)(9.0f)), (2000002L, Seq.fill(64)(-9.0f)))
      .toDF("vec_id", "embedding")
    val pred = LabelOps.pseudoLabels(spark, dir, store, odd)
    assert(pred.count() === 2, "one verdict per input vector, always")
  }
}
