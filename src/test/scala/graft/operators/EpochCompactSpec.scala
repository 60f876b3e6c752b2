package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Compaction identity for the four additive-epoch families: reads are
  * unchanged before/after, epoch dirs collapse to one, and a re-run is a
  * no-op. (AnnIndex/IvfIndex compaction is covered by their own specs —
  * their coexistence-tolerant publish-before-delete differs from the
  * whole-dir swap additive counts need.) */
class EpochCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/i"

  private def epochs(table: String): Set[String] = {
    val fs = new java.io.File(table)
    fs.listFiles().map(_.getName).filter(_.startsWith("epoch=")).toSet
  }

  test("SpanIndex.compact: identical scores, one epoch, idempotent") {
    val a = Seq((1L, "r1 r2 r3 r4 r5 r6 r7 r8 a1 a2")).toDF("doc_id", "text")
    val b = Seq((3L, "c0 r1 r2 r3 r4 r5 r6 r7 r8 c1")).toDF("doc_id", "text")
    val dir = tmpDir("graft-span-compact")
    SpanIndex.buildIndex(spark, a, dir)
    SpanIndex.appendToIndex(spark, dir, b)
    val full = a.union(b)
    def scores = SpanIndex.scoreDocs(spark, full, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val before = scores
    // the cross-epoch duplicate must survive consolidation
    assert(before.exists { case (_, spans, _) => spans > 0 })
    SpanIndex.compact(spark, dir)
    assert(epochs(s"$dir/grams.parquet") === Set("epoch=0"))
    assert(epochs(s"$dir/docs.parquet") === Set("epoch=0"))
    assert(scores === before)
    assert(SpanIndex.residentDocIds(spark, dir).collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    SpanIndex.compact(spark, dir) // no-op on a single epoch
    assert(scores === before)
  }

  test("LmIndex.compact: identical scores, one epoch") {
    val a = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val b = Seq((3L, "c c a b")).toDF("doc_id", "text")
    val dir = tmpDir("graft-lm-compact")
    LmIndex.buildModel(spark, a, dir)
    LmIndex.appendToModel(spark, dir, b)
    val eval = Seq((10L, "a b c")).toDF("doc_id", "text")
    def scores = LmIndex.scoreDocs(spark, eval, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val before = scores
    LmIndex.compact(spark, dir)
    assert(epochs(s"$dir/pairs.parquet") === Set("epoch=0"))
    assert(scores === before)
  }

  test("ClassifyIndex.compact: identical predictions, one epoch") {
    val a = Seq((1L, "en", "cat dog cat"), (2L, "fr", "chat chien chat"),
      (5L, "en", "cat dog")).toDF("doc_id", "lang", "text")
    val b = Seq((7L, "de", "hund katze"), (15L, "de", "hund"))
      .toDF("doc_id", "lang", "text")
    val dir = tmpDir("graft-clf-compact")
    ClassifyIndex.buildModel(spark, a, dir)
    ClassifyIndex.appendToModel(spark, dir, b)
    val full = a.union(b)
    def preds = ClassifyIndex.scoreDocs(spark, full, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val before = preds
    ClassifyIndex.compact(spark, dir)
    assert(epochs(s"$dir/counts.parquet") === Set("epoch=0"))
    assert(preds === before)
  }

  test("PqIndex.compact: identical top-k, one epoch") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, sfDir, "embeddings")
    val dir = tmpDir("graft-pq-compact")
    PqIndex.buildIndex(spark, emb.filter(col("vec_id") % 3 =!= 0), dir)
    PqIndex.appendToIndex(spark, dir, emb.filter(col("vec_id") % 3 === 0))
    val queries = emb.filter(col("vec_id") < SimilarityOps.NumQueries)
    def rows = PqIndex.topKIndexed(spark, queries, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val before = rows
    PqIndex.compact(spark, dir)
    assert(epochs(s"$dir/codes.parquet") === Set("epoch=0"))
    assert(epochs(s"$dir/vecs.parquet") === Set("epoch=0"))
    assert(rows === before)
  }
}
