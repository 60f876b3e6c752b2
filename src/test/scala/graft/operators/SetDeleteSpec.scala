package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deletion for the set-valued and structural families (SpanIndex,
  * PackIndex, EvalIndex, WinnowIndex, SketchIndex, IncrementalDedup,
  * ClusterIndex) — with the count families ([[CountDeleteSpec]]) and the
  * vector/search stores ([[IvfDeleteSpec]]), every persisted family now
  * has a takedown path. Each test pins serve-path parity with a rebuild
  * that never saw the victims. */
class SetDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map((r: Row) => r.toSeq).toSet

  private lazy val fixtureDocs =
    graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("SpanIndex: delete nets the victim's window counts, parity with rebuild") {
    val base = tmp("graft-spandel")
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"), // dup of 1
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12")).toDF("doc_id", "text")
    val full = s"$base/full"
    SpanIndex.buildIndex(spark, docs, full)
    val rebuilt = s"$base/rebuilt"
    SpanIndex.buildIndex(spark, docs.filter(col("doc_id") =!= 2L), rebuilt)
    def spans(d: String) = rowSet(SpanIndex.scoreDocs(
      spark, docs.filter(col("doc_id") =!= 2L), d))
    // doc 1's windows were duplicated ONLY by doc 2 — after the takedown
    // they must drop below the ≥2 filter, exactly as the rebuild scores
    SpanIndex.deleteFromIndex(spark, full, docs.filter(col("doc_id") === 2L))
    assert(spans(full) === spans(rebuilt))
    SpanIndex.compact(spark, full)
    assert(spans(full) === spans(rebuilt))
    assert(!new java.io.File(s"$full/dels.parquet").exists())
  }

  test("PackIndex: tombstoned docs leave manifest holes; later offsets stand") {
    val base = tmp("graft-packdel")
    val docs = fixtureDocs.filter(col("doc_id") < 100L)
      .select(col("doc_id"), col("source"), col("text"))
    val idx = s"$base/idx"
    PackIndex.buildIndex(spark, docs, idx)
    val before = PackIndex.chunksFromIndex(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> start_tok
    PackIndex.deleteFromIndex(spark, idx, Seq(3L, 7L).toDF("doc_id"))
    val after = PackIndex.chunksFromIndex(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the holes vanish; every surviving doc keeps its absolute offset
    assert(!after.contains(3L) && !after.contains(7L))
    assert(after === (before - 3L - 7L))
    // shadow: the tombstoned doc stays resident-listed (re-appends die)
    assert(PackIndex.residentDocIds(spark, idx)
      .filter(col("doc_id") === 3L).count() === 1L)
    PackIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    assert(PackIndex.residentDocIds(spark, idx)
      .filter(col("doc_id") === 3L).count() === 0L)
    val folded = PackIndex.chunksFromIndex(spark, idx)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(folded === after)
  }

  test("EvalIndex: deleting an eval doc keeps shingles other docs still carry") {
    val base = tmp("graft-evaldel")
    val evalDocs = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "b c d e")).toDF("doc_id", "text") // shingles: "b c d", "c d e"
    val idx = s"$base/idx"
    EvalIndex.buildIndex(spark, evalDocs, idx)
    EvalIndex.deleteFromIndex(spark, idx, Seq(1L).toDF("doc_id"))
    def vocab(d: String) = EvalIndex.shingles(spark, d)
      .collect().map(_.getString(0)).toSet
    // "b c d" survives through doc 2's attribution; "a b c" is gone
    assert(vocab(idx) === Set("b c d", "c d e"))
    val rebuilt = s"$base/rebuilt"
    EvalIndex.buildIndex(spark, evalDocs.filter(col("doc_id") === 2L), rebuilt)
    assert(vocab(idx) === vocab(rebuilt))
    EvalIndex.compact(spark, idx)
    assert(vocab(idx) === vocab(rebuilt))
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
  }

  test("WinnowIndex: deletion re-derives reps from surviving members, parity with rebuild") {
    val base = tmp("graft-windel")
    val docs = fixtureDocs.filter(col("doc_id") < 300L)
      .select(col("doc_id"), col("text"))
    val victims = docs.filter(col("doc_id") % 7 === 0)
    val full = s"$base/full"
    WinnowIndex.buildIndex(spark, docs, full)
    val beforeMatches = rowSet(WinnowIndex.matchesFromIndex(spark, full))
    WinnowIndex.deleteFromIndex(spark, full, victims.select("doc_id"))
    val rebuilt = s"$base/rebuilt"
    WinnowIndex.buildIndex(spark, docs.filter(col("doc_id") % 7 =!= 0), rebuilt)
    def matches(d: String) = rowSet(WinnowIndex.matchesFromIndex(spark, d))
    assert(matches(full) === matches(rebuilt))
    assert(matches(full) !== beforeMatches,
      "fixture too easy: no victim participated in any match pair")
    WinnowIndex.compact(spark, full)
    assert(matches(full) === matches(rebuilt))
    assert(!new java.io.File(s"$full/tombstones.parquet").exists())
  }

  test("SketchIndex: counts (and their xor digest) subtract exactly; " +
      "estimates match the rebuild when no victim held a sample slot") {
    val base = tmp("graft-sketchdel")
    val docs = fixtureDocs
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
    val full = s"$base/full"
    SketchIndex.buildIndex(spark, docs, full)
    // victims: resident docs that do NOT occupy a bottom-K sample slot
    val sampleIds = spark.read.parquet(s"$full/sample.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val victimIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filterNot(sampleIds).take(25)
    val victims = docs.filter(col("doc_id").isin(victimIds: _*))
    SketchIndex.deleteFromIndex(spark, full, victims)
    val rebuilt = s"$base/rebuilt"
    SketchIndex.buildIndex(spark,
      docs.filter(!col("doc_id").isin(victimIds: _*)), rebuilt)
    def est(d: String) = rowSet(SketchIndex.estimatesFromIndex(spark, d))
    assert(est(full) === est(rebuilt))
    // the deletion-applying compact preserves the estimates and retires
    // the deletion state — and the netted xor digest equals the
    // rebuild's (the digest of exactly the surviving docs)
    SketchIndex.compact(spark, full)
    assert(est(full) === est(rebuilt))
    assert(!new java.io.File(s"$full/dels.parquet").exists())
    def digests(d: String) = rowSet(spark.read.parquet(s"$d/counts.parquet")
      .select(col("source"), col("n_docs"), col("batch_key")))
    assert(digests(full) === digests(rebuilt))
    // replayed takedown after the apply: a no-op
    SketchIndex.deleteFromIndex(spark, full, victims)
    assert(est(full) === est(rebuilt))
  }

  // shared fixture for the shingle-index pair: a stop-shingle ("p q r",
  // df 53 > cap 50) suppresses the X–Y intersection; deleting three A
  // copies pulls it back UNDER the cap, so an X–Y edge APPEARS and n0s
  // re-correct — the non-monotone case the verdict asked for, reversed
  private def capCorpus = {
    val aCopies = (1L to 51L).map(i => (i, "p q r s"))
    (aCopies ++ Seq(
      (100L, "p q r a b"),
      (101L, "p q r a c"))).toDF("doc_id", "text")
  }

  test("IncrementalDedup: delete ≡ rebuild on all four tables, including the " +
      "cap-crossing n0 raise") {
    val base = tmp("graft-incdel")
    val full = s"$base/full"
    IncrementalDedup.buildIndex(capCorpus, full)
    IncrementalDedup.deleteFromIndex(spark, full, Seq(1L, 2L, 3L).toDF("doc_id"))
    val rebuilt = s"$base/rebuilt"
    IncrementalDedup.buildIndex(capCorpus.filter(col("doc_id") > 3L), rebuilt)
    for (t <- Seq("text_shingles", "shingle_df", "texts", "members"))
      assert(rowSet(spark.read.parquet(s"$full/$t.parquet"))
        === rowSet(spark.read.parquet(s"$rebuilt/$t.parquet")), t)
    // replayed takedown: a no-op (victims no longer members)
    IncrementalDedup.deleteFromIndex(spark, full, Seq(1L, 2L, 3L).toDF("doc_id"))
    assert(rowSet(spark.read.parquet(s"$full/texts.parquet"))
      === rowSet(spark.read.parquet(s"$rebuilt/texts.parquet")))
  }

  test("ClusterIndex: deletion re-clusters affected components — an edge " +
      "APPEARS when the takedown pulls a shared shingle under the cap") {
    val base = tmp("graft-cludel")
    val full = s"$base/full"
    ClusterIndex.buildIndex(capCorpus, full)
    def cluster(d: String, id: Long): Long =
      ClusterIndex.clustersFromIndex(spark, d)
        .filter(col("doc_id") === id).collect()(0).getLong(1)
    // before: the X–Y intersection is cap-suppressed — different clusters
    val xBefore = ClusterIndex.clustersFromIndex(spark, full)
      .filter(col("doc_id").isin(100L, 101L)).collect()
    assert(xBefore.isEmpty ||
      xBefore.map(_.getLong(1)).toSet.size === xBefore.length)
    ClusterIndex.deleteFromIndex(spark, full, Seq(1L, 2L, 3L).toDF("doc_id"))
    val rebuilt = s"$base/rebuilt"
    ClusterIndex.buildIndex(capCorpus.filter(col("doc_id") > 3L), rebuilt)
    // after: X and Y share a cluster (the appeared edge), and every
    // table equals the rebuild's
    assert(cluster(full, 100L) === cluster(full, 101L))
    for (t <- Seq("edges", "labels", "doc_meta", "texts", "members"))
      assert(rowSet(spark.read.parquet(s"$full/$t.parquet"))
        === rowSet(spark.read.parquet(s"$rebuilt/$t.parquet")), t)
    assert(rowSet(ClusterIndex.canonicalFromIndex(spark, full))
      === rowSet(ClusterIndex.canonicalFromIndex(spark, rebuilt)))
  }
}
