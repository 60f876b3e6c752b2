package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The persisted-store root is configurable (r13 verdict #2): two
  * lease-safe drivers sharing warm stores on shared storage was the
  * point of the writer lease, and a root pinned to driver-local
  * `java.io.tmpdir` blocked it. Pins: (a) an indexed lane BUILDS and
  * SERVES through a non-default root with results identical to the
  * inline body it rides the oracle of; (b) the votes artifact's
  * store-staleness detector works through the Hadoop-FS mtime path on
  * that root (a takedown still invalidates); (c) the default is
  * unchanged when nothing is configured. */
class StoreRootSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpusDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rootcorpus").toString
    Seq(
      (1L, "alpha beta alpha gamma delta epsilon zeta eta", "en", "s0"),
      (2L, "gamma delta epsilon zeta alpha beta theta iota", "de", "s0"),
      (3L, "alpha beta beta delta gamma epsilon kappa mu", "en", "s1"),
      (4L, "zeta eta theta iota kappa mu nu xi", "de", "s1"),
      (5L, "beta gamma delta epsilon zeta eta theta nu", "en", "s0"),
      (6L, "iota kappa mu nu xi alpha beta gamma", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set(StoreRoot.ConfKey, root)
    try body finally spark.conf.unset(StoreRoot.ConfKey)
  }

  test("an indexed lane builds and serves through a NON-DEFAULT store " +
      "root (spark conf), results identical to its inline body") {
    val dir = corpusDir()
    val customRoot = java.nio.file.Files
      .createTempDirectory("graft-customroot").toString
    val (indexed, inline) = withRoot(customRoot) {
      assert(StoreRoot.root === customRoot)
      val served = graft.SparkEntry.queries("q_bm25_search_indexed")(spark, dir)
        .collect().map(_.toSeq).toSet
      // the postings store must have landed UNDER the configured root
      val stores = new java.io.File(customRoot).listFiles()
        .map(_.getName).filter(_.startsWith("graft-search-index-"))
      assert(stores.nonEmpty,
        s"expected a search store under $customRoot, found ${stores.toSeq}")
      (served,
        graft.SparkEntry.queries("q_bm25_search")(spark, dir)
          .collect().map(_.toSeq).toSet)
    }
    assert(indexed === inline,
      "the store-served lane must stay row-identical to the inline body " +
        "under a non-default root (same oracle)")
    // default root untouched by the scoped override
    assert(StoreRoot.root === System.getProperty("java.io.tmpdir"))
  }

  test("the votes artifact's staleness detector (Hadoop-FS mtime path + " +
      "watermark sidecar) works through a non-default root: a takedown " +
      "still invalidates") {
    val dir = corpusDir()
    val customRoot = java.nio.file.Files
      .createTempDirectory("graft-customroot2").toString
    withRoot(customRoot) {
      val vdir = CurationFunnel.ensureVotes(spark, dir)
      assert(vdir.startsWith(customRoot),
        s"votes artifact must live under the configured root: $vdir")
      def watermark(): Long =
        java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$vdir/votes.parquet/_watermark")).trim.toLong
      val w1 = watermark()
      // memoized while stores are untouched
      CurationFunnel.ensureVotes(spark, dir)
      assert(watermark() === w1)
      // takedown mutates the (custom-root) clf/LM stores; the FS-mtime
      // staleness read must see it and re-materialize
      val docs = graft.Tables.table(spark, dir, "documents")
      Takedown.sweep(spark, docs.filter(col("doc_id") === 2L), Seq(
        ClassifyIndex.ensureModel(spark, dir),
        LmIndex.ensureModel(spark, dir)))
      CurationFunnel.ensureVotes(spark, dir)
      assert(watermark() > w1,
        "a store mutation under the custom root must invalidate the votes")
    }
  }
}
