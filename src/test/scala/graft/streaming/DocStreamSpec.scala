package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import DocStream._

  private def ts(s: String) = Timestamp.valueOf(s)

  // >=3 tokens so the MinHash signature is defined; base/copy share all
  // shingles, distinct is disjoint
  private val base = "alpha beta gamma delta epsilon zeta eta theta"
  private val distinct = "one two three four five six seven eight nine"

  test("signatureDedupStream suppresses signature-identical docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = signatureDedupStream(input.toDF()).writeStream
      .format("memory").queryName("sigdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), base),
        Doc(2L, ts("2024-01-01 10:01:00"), base), // exact dup
        Doc(3L, ts("2024-01-01 10:02:00"), distinct))
      q.processAllAvailable()
      // a later batch re-sending the same content is also suppressed
      input.addData(Doc(4L, ts("2024-01-01 10:10:00"), base))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM sigdedup ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept === Seq(1L, 3L))
    } finally q.stop()
  }

  test("nearDupCandidates proposes keeper pairs for near-duplicates") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val pairs = nearDupCandidates(spark, input.toDF())
    val q = pairs.writeStream.format("memory").queryName("cands")
      .outputMode(OutputMode.Append()).start()
    try {
      // doc 2 is a near-dup of doc 1 (one token changed → most shingles
      // shared → some band agrees); doc 3 is unrelated
      input.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), base),
        Doc(2L, ts("2024-01-01 10:01:00"), base.replace("theta", "iota")),
        Doc(3L, ts("2024-01-01 10:02:00"), distinct))
      q.processAllAvailable()
      // a second batch: another copy of doc 1's content pairs with the
      // STATE-held keeper, proving the bucket survives across batches
      input.addData(Doc(4L, ts("2024-01-01 10:20:00"), base))
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT keeper_id, doc_id FROM cands")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)), s"expected near-dup pair (1,2) in $got")
      assert(got.contains((1L, 4L)), s"expected cross-batch pair (1,4) in $got")
      assert(!got.exists { case (k, d) => k == 3L || d == 3L },
        s"unrelated doc 3 must not pair: $got")
    } finally q.stop()
  }

  test("qualityFilterStream drops short, mode-dominated and repetitive docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = qualityFilterStream(input.toDF()).writeStream
      .format("memory").queryName("qgate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), base), // clean → passes
        Doc(2L, ts("2024-01-01 10:01:00"), "too short"), // < 5 tokens
        Doc(3L, ts("2024-01-01 10:02:00"), "spam spam spam spam spam spam"), // mode-dominated
        Doc(4L, ts("2024-01-01 10:03:00"), "x y z x y z x y z x y z")) // 3-gram repetitive
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM qgate ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept === Seq(1L))
    } finally q.stop()
  }

  test("verifiedNearDups: exact verification gates the proposed pairs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // near-dup of base differs in ONE token → exact jaccard 5/7 ≈ 0.714:
    // passes at 0.5, rejected at 0.9; the exact copy is 1.0 — passes both
    val nearDup = base.replace("theta", "iota")
    val corpus = Seq((1L, base), (2L, nearDup), (3L, distinct), (4L, base))
      .toDF("doc_id", "text")
    def runWith(threshold: Double): Set[(Long, Long)] = {
      val input = MemoryStream[Doc]
      val got = scala.collection.mutable.Set.empty[(Long, Long)]
      val q = DocStream.verifiedNearDups(spark, input.toDF(), corpus, threshold) {
        verified =>
          got ++= verified.collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      try {
        input.addData(
          Doc(1L, ts("2024-01-01 10:00:00"), base),
          Doc(2L, ts("2024-01-01 10:01:00"), nearDup),
          Doc(3L, ts("2024-01-01 10:02:00"), distinct),
          Doc(4L, ts("2024-01-01 10:03:00"), base))
        q.processAllAvailable()
      } finally q.stop()
      got.toSet
    }
    val loose = runWith(0.5)
    assert(loose.contains((1L, 2L)), s"near-dup must verify at 0.5: $loose")
    assert(loose.contains((1L, 4L)), s"exact copy must verify: $loose")
    assert(!loose.exists { case (k, d) => k == 3L || d == 3L },
      s"unrelated doc must not verify: $loose")
    val strict = runWith(0.9)
    assert(!strict.contains((1L, 2L)),
      s"0.714-jaccard pair must be rejected at 0.9: $strict")
    assert(strict.contains((1L, 4L)), s"exact copy must survive 0.9: $strict")
  }

  test("selfMaintainingNearDups catches a dup of a PREVIOUS batch's novel doc") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-docstream").resolve("corpus").toString
    val nearDup = base.replace("theta", "iota")
    val input = MemoryStream[Doc]
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = DocStream.selfMaintainingNearDups(spark, input.toDF(), corpusDir, 0.5) {
      verified => got ++= verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    try {
      // batch 1: all novel — no resident corpus exists yet
      input.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), base),
        Doc(3L, ts("2024-01-01 10:02:00"), distinct))
      q.processAllAvailable()
      assert(got.isEmpty, s"nothing to confirm in the all-novel batch: $got")
      val resident1 = spark.read.parquet(corpusDir)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(resident1 === Set(1L, 3L), s"novel docs must be folded in: $resident1")
      // batch 2: dup of batch 1's doc 1 — the corpus was EMPTY when doc 1
      // arrived, so only the fold-back makes this verifiable
      input.addData(
        Doc(4L, ts("2024-01-01 10:10:00"), base),
        Doc(5L, ts("2024-01-01 10:11:00"), nearDup))
      q.processAllAvailable()
      assert(got.contains((1L, 4L)), s"cross-batch exact dup must verify: $got")
      assert(got.contains((1L, 5L)), s"cross-batch near-dup must verify: $got")
      val resident2 = spark.read.parquet(corpusDir)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(resident2 === Set(1L, 3L),
        s"confirmed dups must NOT be admitted to the corpus: $resident2")
      // ...but their texts must land in the suppressed side table, so the
      // band buckets they claimed stay resolvable in later batches
      val supp = spark.read.parquet(DocStream.suppressedDir(corpusDir))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(supp === Set(4L, 5L), s"confirmed dups must be recorded: $supp")
    } finally q.stop()
  }

  test("a pair whose keeper is SUPPRESSED (not resident) still verifies") {
    import spark.implicits._
    // the cross-batch recall hole: doc 2 was confirmed as a dup in an
    // earlier batch (suppressed, never resident) yet kept the band buckets
    // it claimed; doc 3 now collides with one of them. Without the
    // suppressed side table the verify join finds no text for keeper 2 and
    // silently admits doc 3 as novel.
    val nearDup = base.replace("theta", "iota")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-suppressed").resolve("corpus").toString
    Seq((1L, base)).toDF("doc_id", "text").write.parquet(dir)
    Seq((2L, nearDup)).toDF("doc_id", "text")
      .write.parquet(DocStream.suppressedDir(dir))
    val batch = Seq((2L, 3L, 0, nearDup))
      .toDF("keeper_id", "doc_id", "band", "text")
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    DocStream.processSelfMaintainingBatch(spark, dir, batch, 0.5,
      verified => got ++= verified.collect().map(r => (r.getLong(0), r.getLong(1))))
    assert(got === Set((2L, 3L)),
      s"suppressed keeper must resolve during verification: $got")
    val resident = spark.read.parquet(dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(resident === Set(1L), s"doc 3 must NOT be admitted: $resident")
    val supp = spark.read.parquet(DocStream.suppressedDir(dir))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(supp === Set(2L, 3L), s"doc 3 must join the suppressed set: $supp")
  }

  test("short docs (<3 tokens, null signature) still reach the corpus") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-shortdoc").resolve("corpus").toString
    val input = MemoryStream[Doc]
    val q = DocStream.selfMaintainingNearDups(spark, input.toDF(), corpusDir, 0.5) {
      _ => ()
    }
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), base),
        Doc(9L, ts("2024-01-01 10:01:00"), "hi there")) // no signature
      q.processAllAvailable()
      val resident = spark.read.parquet(corpusDir)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(resident === Set(1L, 9L),
        s"signature-null docs are trivially novel and must fold back: $resident")
    } finally q.stop()
  }

  test("trendingTermsStream emits a final top-k per window on close") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val got = scala.collection.mutable.Buffer.empty[(String, Long, Int)]
    val q = DocStream.trendingTermsStream(input.toDF(), "1 hour", "1 hour", 2) {
      df => got ++= df.collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    }
    try {
      // window [10:00, 11:00): alpha ×3, beta ×2, gamma ×1
      input.addData(
        Doc(1L, ts("2024-01-01 10:05:00"), "alpha alpha beta"),
        Doc(2L, ts("2024-01-01 10:40:00"), "alpha beta gamma"))
      q.processAllAvailable()
      assert(got.isEmpty, s"window must not emit before its watermark passes: $got")
      // event at 12:30 → watermark 11:30 ≥ window end → the window closes
      input.addData(Doc(3L, ts("2024-01-01 12:30:00"), "late tokens here"))
      q.processAllAvailable()
      assert(got.toSet === Set(("alpha", 3L, 1), ("beta", 2L, 2)),
        s"expected final top-2 of the closed window, got $got")
    } finally q.stop()
  }

  test("stream banding agrees with the batch LSH band keys") {
    import spark.implicits._
    // the stream's (band, bkey) construction must equal the batch
    // formulation over the same signature — same slicing, same fold
    val docs = Seq((1L, base), (2L, distinct)).toDF("doc_id", "text")
      .withColumn("sig", graft.functions.MinHash.signature(col("text")))
    val fromExpr = docs.select(col("doc_id"),
        expr(s"transform(sequence(0, ${NumBands - 1}), b -> " +
          s"xxhash64(b, slice(sig, b*$BandSize + 1, $BandSize)))").as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = docs.collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    sigs.foreach { case (id, sig) =>
      val manual = (0 until NumBands).map { b =>
        docs.sparkSession.range(1).select(
          xxhash64(lit(b), typedLit(sig.slice(b * BandSize, (b + 1) * BandSize))))
          .head().getLong(0)
      }
      assert(fromExpr(id) === manual, s"band keys diverge for doc $id")
    }
  }

  test("clusterMaintenanceStream: streamed index == batch build; replays are no-ops") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // the ClusterIndexSpec split fixture, fed as a stream: batch 2 must
    // CREATE the A-B edge against resident A, batch 3's cap crossing must
    // SPLIT the component — mid-stream merge and split both exercised
    val A = "a b c d e"; val B = "a b c d f"
    val dir = java.nio.file.Files.createTempDirectory("graft-clidx-stream")
      .toString + "/idx"
    val input = MemoryStream[Doc]
    val q = clusterMaintenanceStream(spark, input.toDF(), dir)
    val t0 = ts("2024-01-01 10:00:00")
    try {
      input.addData(Doc(1L, t0, A), Doc(2L, t0, A))
      q.processAllAvailable()
      input.addData(Doc(3L, t0, B), Doc(4L, t0, B))
      q.processAllAvailable()
      // resident docs in a later batch must not double-count (replay shape)
      input.addData((1000L until 1049L).map(i => Doc(i, t0, "a b c")) :+ Doc(1L, t0, A): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamedClusters = graft.operators.ClusterIndex
      .clustersFromIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamedClusters ===
      Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 3L, 1L), (4L, 3L, 0L)))

    // parity: the streamed index equals one batch build over everything
    val all = spark.createDataFrame(
      Seq(1L -> A, 2L -> A, 3L -> B, 4L -> B) ++
        (1000L until 1049L).map(_ -> "a b c")).toDF("doc_id", "text")
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-clidx-stream-reb")
      .toString + "/idx"
    graft.operators.ClusterIndex.buildIndex(all, rebuilt)
    def rowsOf(d: String, t: String): Map[Seq[Any], Long] =
      spark.read.parquet(s"$d/$t.parquet").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tables = Seq("text_shingles", "shingle_df", "texts", "members",
      "edges", "labels", "doc_meta")
    for (t <- tables) assert(rowsOf(dir, t) === rowsOf(rebuilt, t), s"table $t diverged")

    // replay idempotence: re-delivering a whole processed batch is a no-op
    DocStream.processClusterBatch(spark, dir,
      Seq(3L -> B, 4L -> B).toDF("doc_id", "text"))
    for (t <- tables) assert(rowsOf(dir, t) === rowsOf(rebuilt, t), s"replay changed $t")
  }
}
