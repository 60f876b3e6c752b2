package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The merged-totals artifacts (round 17): [[LmIndex.ensureTotals]] and
  * [[SelectOps.ensureMerged]] move the per-serve epoch merge (and, for
  * Moore-Lewis, the two-store full-outer vocabulary join) into a
  * watermarked store artifact. These pin the two rules that make that
  * safe: (1) what the artifact serves is bit-identical to the totals a
  * fresh read-merge of the store produces, and (2) any store mutation —
  * an append epoch, a takedown's negative epochs — re-materializes it
  * (the [[VotesStalenessSpec]] rule, applied to the new artifacts). */
class LmTotalsArtifactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsA = Seq(
    (1L, "alpha beta alpha gamma delta", "s0"),
    (2L, "gamma delta epsilon zeta alpha beta", "s0"),
    (3L, "alpha beta beta delta gamma", "s1"))
    .toDF("doc_id", "text", "source")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSet

  test("ensureTotals serves the store's read-merge exactly, and an " +
      "append re-materializes it") {
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-lmtot-spec").toString + "/m"
    LmIndex.buildModel(spark, docsA, modelDir)

    val live = LmIndex.ensureTotals(spark, modelDir)
    def wm(): Long = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$live/_watermark")).trim.toLong
    val stamp1 = wm()
    assert(rows(spark.read.parquet(s"$live/pairs")) ===
      rows(LmIndex.pairTotals(spark, modelDir)
        .select(col("l"), col("r"), col("c12"))))
    assert(rows(spark.read.parquet(s"$live/prefix")) ===
      rows(LmIndex.prefixTotals(spark, modelDir).select(col("l"), col("c1"))))

    // memoized while the store is untouched
    assert(LmIndex.ensureTotals(spark, modelDir) === live)
    assert(wm() === stamp1)

    // an append mutates the store; the artifact must follow it
    LmIndex.appendToModel(spark, modelDir,
      Seq((9L, "zeta eta zeta eta theta", "s0")).toDF("doc_id", "text", "source"))
    assert(LmIndex.ensureTotals(spark, modelDir) === live)
    assert(wm() > stamp1, "an append must re-materialize the totals artifact")
    assert(rows(spark.read.parquet(s"$live/pairs")) ===
      rows(LmIndex.pairTotals(spark, modelDir)
        .select(col("l"), col("r"), col("c12"))))
  }

  test("ensureMerged equals storeCounts, and a takedown against either " +
      "store re-materializes it") {
    val dir =
      java.nio.file.Files.createTempDirectory("graft-mlmerged-spec").toString
    docsA.write.parquet(s"$dir/documents.parquet")
    val (inDir, outDir) = SelectOps.ensureMlModels(spark, dir)
    val live = SelectOps.ensureMerged(spark, dir)
    def wm(): Long = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$live/_watermark")).trim.toLong
    val stamp1 = wm()
    val (cnt2, cnt1) = SelectOps.storeCounts(spark, inDir, outDir)
    assert(rows(spark.read.parquet(s"$live/cnt2")) ===
      rows(cnt2.select(col("l"), col("r"), col("c12_in"), col("c12_out"))))
    assert(rows(spark.read.parquet(s"$live/cnt1")) ===
      rows(cnt1.select(col("l"), col("c1_in"), col("c1_out"))))
    assert(SelectOps.ensureMerged(spark, dir) === live)
    assert(wm() === stamp1)

    // delete doc 3 from the OUT store (documents.parquet untouched — the
    // artifact's IndexStamp key cannot see it; the watermark must)
    LmIndex.deleteFromModel(spark, outDir,
      docsA.filter(col("doc_id") === 3L))
    assert(SelectOps.ensureMerged(spark, dir) === live)
    assert(wm() > stamp1, "a store takedown must re-materialize the merge")
    val (cnt2b, _) = SelectOps.storeCounts(spark, inDir, outDir)
    assert(rows(spark.read.parquet(s"$live/cnt2")) ===
      rows(cnt2b.select(col("l"), col("r"), col("c12_in"), col("c12_out"))))
  }
}
