package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** The round-14 sampled indexed≡inline certificate inside `q_curation2`
  * (the r13 verdict's "certify on a deterministic sub-corpus sample"
  * restructure): the lane must (a) serve the full-corpus ledger
  * row-identical to the indexed lane, (b) materialize the sample corpus
  * once and reuse it, and (c) actually FIRE — a poisoned sample votes
  * artifact (served, not stale) must fail the lane loudly instead of
  * silently certifying. Runs against a PRIVATE copy of the fixture so
  * poisoning never leaks into the fixture's global store universe. */
class FunnelCertificateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A test-private corpus dir: its own IndexStamp identity, hence its
    * own sample/store/votes universe. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-certspec-").toString
    Files.copy(
      Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(s"$d/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d
  }

  test("q_curation2 serves the full ledger and certifies on the sample") {
    val full = QueryRegistry.byName("q_curation2").run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val indexed = QueryRegistry.byName("q_curation2_indexed").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(full.toSeq === indexed.toSeq)
    assert(full.head._2 > 0, "ledger must be non-vacuous on the fixture")

    // the sample corpus is the deterministic 1/8 slice, materialized once
    val sdir = CurationFunnel.ensureSampleCorpus(spark, dir)
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(xxhash64(col("doc_id")), lit(8L)) === lit(3L)).count()
    val got = spark.read.parquet(s"$sdir/documents.parquet").count()
    assert(got === want && got > 0, "sample must be the hash-mod slice")
    val stamp = new java.io.File(s"$sdir/documents.parquet").lastModified()
    QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    assert(new java.io.File(s"$sdir/documents.parquet").lastModified() === stamp,
      "a second run must reuse the materialized sample corpus")
  }

  test("a diverged sample votes artifact fails the certificate loudly") {
    // warm everything, then poison the SAMPLE corpus's votes artifact:
    // zero out is_correct (the inline side predicts >0 correct on the
    // fixture, so stage 3 must diverge) and refresh the watermark so the
    // poisoned artifact is SERVED, not rebuilt
    QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    val sdir = CurationFunnel.ensureSampleCorpus(spark, dir)
    val inline3 = CurationFunnel
      .inlineLedgerOver(spark, graft.Tables.table(spark, sdir, "documents"))
      .filter(col("stage") === "3_classifier").head().getLong(1)
    assert(inline3 > 0, "fixture must have correct predictions or the poison is vacuous")

    val vdir = CurationFunnel.ensureVotes(spark, sdir)
    val votesPath = s"$vdir/votes.parquet"
    val poisoned = spark.read.parquet(votesPath)
      .withColumn("is_correct", lit(0L)).collect()
    val schema = spark.read.parquet(votesPath).schema
    val tmp = s"$vdir/.poison.tmp"
    spark.createDataFrame(
      spark.sparkContext.parallelize(poisoned.toIndexedSeq), schema)
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(votesPath), true)
    assert(fs.rename(p(tmp), p(votesPath)))
    // future-dated watermark: the staleness rule (storesMtime > watermark)
    // must keep serving the poisoned artifact
    val out = fs.create(p(s"$votesPath/_watermark"), true)
    out.write(s"${Long.MaxValue}\n".getBytes("UTF-8")); out.close()

    val e = intercept[IllegalStateException] {
      QueryRegistry.byName("q_curation2").run(spark, dir).collect()
    }
    assert(e.getMessage.contains("certificate FAILED"))
    // un-poison for any later suite touching this corpus
    fs.delete(p(vdir), true)
    QueryRegistry.byName("q_curation2").run(spark, dir).collect()
  }
}
