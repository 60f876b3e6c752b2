package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The fleet topology rounds 13–14 were built for, end to end through a
  * REAL process boundary: driver A (this JVM) materializes a persisted
  * model store under a SHARED configurable root; driver B (a forked,
  * fully separate Spark driver — [[SharedStoreProbeMain]]) points at the
  * same root and must SERVE the warm store — same scores, same model
  * dir, zero writes. [[StoreRootSpec]] pins the root plumbing in one
  * JVM; [[ForkedLeaseSpec]] pins write EXCLUSION across processes; this
  * spec pins the payoff the two exist for: build once, serve fleet-wide. */
class SharedStoreFleetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpusDir(): String = {
    val dir = Files.createTempDirectory("graft-fleetcorpus").toString
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

  /** (path, mtime) of every file under `root` — the zero-writes probe. */
  private def snapshot(root: String): Set[(String, Long)] = {
    val out = scala.collection.mutable.Set.empty[(String, Long)]
    def walk(p: Path): Unit = {
      out += ((p.toString, Files.getLastModifiedTime(p).toMillis))
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().forEachRemaining(walk(_)) finally s.close()
      }
    }
    walk(Paths.get(root))
    out.toSet
  }

  test("a SECOND Spark driver serves the warm store through the shared " +
      "root: identical scores, same store, zero writes") {
    val dir = corpusDir()
    val root = Files.createTempDirectory("graft-sharedroot").toString
    val outDir = Files.createTempDirectory("graft-fleetout").toString

    // driver A: build under the shared root, score inline for reference
    spark.conf.set(StoreRoot.ConfKey, root)
    val (mdirA, expected) =
      try {
        val m = LmIndex.ensureModel(spark, dir)
        assert(m.startsWith(root), s"store must land under the shared root: $m")
        (m, LmIndex.scoreDocs(spark, graft.Tables.table(spark, dir, "documents"), m)
          .collect().map(_.toSeq).toSet)
      } finally spark.conf.unset(StoreRoot.ConfKey)
    val before = snapshot(root)

    // driver B: a real separate Spark driver on the same root. The test
    // JVM carries the full dependency classpath and the JDK17 add-opens
    // Spark needs (build.sbt javaOptions), so the probe inherits both.
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.iterator()
      while (it.hasNext) {
        val a = it.next()
        // both spellings: "--add-opens pkg=ALL-UNNAMED" (two tokens, the
        // build.sbt form) and "--add-opens=pkg=ALL-UNNAMED" (one token)
        if ((a == "--add-opens" || a == "--add-exports") && it.hasNext) {
          buf += a; buf += it.next()
        } else if (a.startsWith("--add-opens=") ||
            a.startsWith("--add-exports=")) buf += a
      }
      buf.toSeq
    }
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.operators.SharedStoreProbeMain", dir, root, outDir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val probe = pb.start()
    try {
      assert(probe.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "probe driver timed out")
      assert(probe.exitValue() === 0, "probe driver failed")
    } finally { if (probe.isAlive) probe.destroyForcibly(); () }

    // same model dir, identical scores, and the store was only READ
    val mdirB = Files.readString(Paths.get(outDir, "modeldir.txt")).trim
    assert(mdirB === mdirA, "both drivers must resolve ONE store")
    val served = spark.read.parquet(s"$outDir/scores.parquet")
      .collect().map(_.toSeq).toSet
    assert(served === expected,
      "the second driver's store-served scores must equal the builder's")
    assert(snapshot(root) === before,
      "serving a warm store must not write under the shared root")
  }
}
