package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The votes artifact ([[CurationFunnel.ensureVotes]]) is keyed by
  * CORPUS identity, but scored from the classifier/LM STORES — and a
  * takedown mutates the stores without touching documents.parquet. A
  * corpus-keyed cache with no store-staleness check would serve the
  * victims' pre-deletion scores forever; this pins the rule: any store
  * mutation re-materializes the artifact, and what it then serves is
  * bit-identical to a from-scratch re-score of the stores as they are
  * NOW. */
class VotesStalenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a takedown against the funnel stores invalidates the votes " +
      "artifact; the rebuilt votes equal a fresh re-score") {
    val dir = java.nio.file.Files.createTempDirectory("graft-votesstale").toString
    val docs = Seq(
      (1L, "alpha beta alpha gamma delta epsilon zeta eta", "en", "s0"),
      (2L, "gamma delta epsilon zeta alpha beta theta iota", "de", "s0"),
      (3L, "alpha beta beta delta gamma epsilon kappa mu", "en", "s1"),
      (4L, "zeta eta theta iota kappa mu nu xi", "de", "s1"),
      (5L, "beta gamma delta epsilon zeta eta theta nu", "en", "s0"),
      (6L, "iota kappa mu nu xi alpha beta gamma", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    docs.write.parquet(s"$dir/documents.parquet")

    def votesRows(vdir: String): Set[Seq[Any]] =
      spark.read.parquet(s"$vdir/votes.parquet")
        .collect().map(_.toSeq.map(String.valueOf: Any => String)).toSet

    val vdir = CurationFunnel.ensureVotes(spark, dir)
    val votesFile = new java.io.File(s"$vdir/votes.parquet")
    def watermark(): Long =
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$vdir/votes.parquet/_watermark")).trim.toLong
    // the pre-read watermark is a SIDECAR published atomically with the
    // data (r14 — the r13 setLastModified stamp's boolean result was
    // ignored and its mtime carrier doesn't survive non-local roots)
    val stamp1 = watermark()
    val mtime1 = votesFile.lastModified()
    // memoized while the stores are untouched
    assert(CurationFunnel.ensureVotes(spark, dir) === vdir)
    assert(watermark() === stamp1)
    assert(votesFile.lastModified() === mtime1)

    // the takedown mutates the clf + LM stores (neg epochs + dels) with
    // documents.parquet — the artifact's IndexStamp key — unchanged
    val clf = ClassifyIndex.ensureModel(spark, dir)
    val lm = LmIndex.ensureModel(spark, dir)
    Takedown.sweep(spark, docs.filter(col("doc_id") === 2L), Seq(clf, lm))

    assert(CurationFunnel.ensureVotes(spark, dir) === vdir)
    assert(watermark() > stamp1,
      "a store mutation must re-materialize the corpus-keyed votes")
    val served = votesRows(vdir)

    // ground truth: wipe the artifact entirely and re-score from the
    // post-deletion stores — the staleness rebuild must equal it
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(vdir))
    assert(votesRows(CurationFunnel.ensureVotes(spark, dir)) === served,
      "the invalidated-and-rebuilt votes must equal a from-scratch re-score")

    // and a further ensure with no store change serves without rebuilding
    val stamp2 = watermark()
    val mtime2 = votesFile.lastModified()
    CurationFunnel.ensureVotes(spark, dir)
    assert(watermark() === stamp2)
    assert(votesFile.lastModified() === mtime2)
  }

  test("the ensure-writer shape WAITS out a foreign builder's lease and " +
      "then SERVES the artifact the foreign builder published — no " +
      "duplicate rebuild, no refusal (round 14: derived-artifact " +
      "writers joined the lock+lease convention with a waiting lease)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-voteswait").toString
    Seq(
      (1L, "alpha beta alpha gamma delta", "en", "s0"),
      (2L, "gamma delta epsilon zeta alpha", "de", "s0"),
      (3L, "alpha beta beta delta gamma", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    // warm once, then simulate "a foreign builder is mid-build": the
    // artifact is hidden (renamed away) and a FRESH foreign lease sits
    // on its dir — the exact shape a second fleet driver sees
    val vdir = CurationFunnel.ensureVotes(spark, dir)
    val votes = java.nio.file.Paths.get(s"$vdir/votes.parquet")
    val hidden = java.nio.file.Paths.get(s"$vdir/.votes.hidden")
    val publishStamp = votes.toFile.lastModified() // the builder's stamp
    java.nio.file.Files.move(votes, hidden)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(vdir + ".lease"),
      "99999@other-host#feedbeef\nspec-foreign-builder\n")
    // the foreign builder "finishes" 300 ms in: it PUBLISHES the
    // artifact (restore, watermark intact and still fresh vs the
    // untouched stores) and releases its lease
    val releaser = new Thread(() => {
      Thread.sleep(300)
      java.nio.file.Files.move(hidden, votes)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(vdir + ".lease"))
      ()
    })
    releaser.start()
    val t0 = System.nanoTime()
    val again = CurationFunnel.ensureVotes(spark, dir)
    releaser.join()
    val waitedMs = (System.nanoTime() - t0) / 1000000L
    assert(again === vdir)
    assert(waitedMs >= 300, s"must have waited the foreign lease out (${waitedMs}ms)")
    // SERVED, not rebuilt: the inside-the-lock re-check saw the foreign
    // builder's fresh watermark and skipped the build — a rebuild would
    // stage+rename a NEW votes.parquet, changing the dir's mtime off the
    // original publish stamp (move/restore preserves it)
    assert(java.nio.file.Files.exists(votes))
    assert(votes.toFile.lastModified() === publishStamp,
      "the waiter must serve the foreign builder's published artifact, " +
        "never re-publish it (duplicate rebuild after the wait)")
    val fpBefore = spark.read.parquet(votes.toString).count()
    CurationFunnel.ensureVotes(spark, dir)
    assert(votes.toFile.lastModified() === publishStamp,
      "a later warm call must serve too")
    assert(spark.read.parquet(votes.toString).count() === fpBefore)
  }
}
