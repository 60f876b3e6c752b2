package graft.operators

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class SampledCertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("digest is order-insensitive and multiplicity-sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "s")
    assert(SampledCert.digestOf(a).same(SampledCert.digestOf(b)))
    // an even multiplicity change must flip the digest (the XOR blindness
    // a SUM digest exists to avoid)
    val dup2 = Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    assert(!SampledCert.digestOf(a).same(SampledCert.digestOf(dup2)))
    // empty input digests to (0, 0) instead of failing on a null SUM
    val empty = SampledCert.digestOf(a.filter($"id" > 99))
    assert(empty.n === 0L)
    assert(empty.hsum.compareTo(java.math.BigDecimal.ZERO) === 0)
  }

  test("certify records on first run, fast-paths on match, self-heals a " +
      "poisoned record, and throws a bounded diff on divergence") {
    val sdir = Files.createTempDirectory("graft-cert").toString
    def df(rows: Seq[(Long, Long)]): DataFrame = rows.toDF("k", "v")
    val good = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    var inlineRuns = 0
    def inline: DataFrame = { inlineRuns += 1; df(good) }

    SampledCert.certify(spark, sdir, "spec", df(good), inline)
    assert(inlineRuns === 1, "first run must compute the inline truth")
    val cert = java.nio.file.Paths.get(sdir, "_spec_certificate")
    assert(Files.exists(cert))
    val recorded = Files.readString(cert)

    SampledCert.certify(spark, sdir, "spec", df(good), inline)
    assert(inlineRuns === 1, "a standing record must skip the inline side")

    // poisoned-but-parseable record → inline recomputed, record self-heals
    Files.writeString(cert, "graft-spec-certificate-v2\n1\n1\nend")
    SampledCert.certify(spark, sdir, "spec", df(good), inline)
    assert(inlineRuns === 2)
    assert(Files.readString(cert) === recorded, "record must self-heal")

    // diverged served side → loud failure naming rows from both sides
    val bad = Seq((1L, 10L), (2L, 99L), (3L, 30L))
    val e = intercept[IllegalStateException] {
      SampledCert.certify(spark, sdir, "spec", df(bad), inline)
    }
    assert(e.getMessage.contains("certificate FAILED"))
    assert(e.getMessage.contains("[2,20]"), "inline-only row must be named")
    assert(e.getMessage.contains("[2,99]"), "indexed-only row must be named")
    // the failed proof must not overwrite the record
    assert(Files.readString(cert) === recorded)
  }

  test("certifyStamped: an untouched store serves on the recorded proof " +
      "without evaluating either side; a store mutation forces the digest " +
      "re-proof (and only a digest mismatch reaches the inline truth)") {
    val sdir = Files.createTempDirectory("graft-certstamp").toString
    val store = Files.createTempDirectory("graft-certstore")
    Files.writeString(store.resolve("epoch-0.parquet"), "payload")
    def df(rows: Seq[(Long, Long)]): DataFrame = rows.toDF("k", "v")
    val good = Seq((1L, 10L), (2L, 20L))
    var idxRuns = 0
    var inlRuns = 0
    def indexed: DataFrame = { idxRuns += 1; df(good) }
    def inline: DataFrame = { inlRuns += 1; df(good) }

    SampledCert.certifyStamped(spark, sdir, "st", store.toString, indexed, inline)
    assert((idxRuns, inlRuns) === ((1, 1)), "first run proves both sides")

    SampledCert.certifyStamped(spark, sdir, "st", store.toString, indexed, inline)
    assert((idxRuns, inlRuns) === ((1, 1)),
      "an untouched store must not evaluate either side (zero Spark jobs)")

    // mutate the store: the stamp flips, the served side is re-digested,
    // matches the recorded digest, and the stamp self-refreshes
    Files.writeString(store.resolve("epoch-1.parquet"), "more")
    SampledCert.certifyStamped(spark, sdir, "st", store.toString, indexed, inline)
    assert((idxRuns, inlRuns) === ((2, 1)),
      "a mutated store re-digests the served side but not the inline truth")
    SampledCert.certifyStamped(spark, sdir, "st", store.toString, indexed, inline)
    assert((idxRuns, inlRuns) === ((2, 1)), "stamp refreshed — fast again")

    // mutate the store AND diverge the served rows: full failure path
    Files.writeString(store.resolve("epoch-2.parquet"), "evil")
    val e = intercept[IllegalStateException] {
      SampledCert.certifyStamped(spark, sdir, "st", store.toString,
        df(Seq((1L, 10L), (2L, 99L))), inline)
    }
    assert(e.getMessage.contains("certificate FAILED"))
  }

  test("round-16 certification lanes still equal their full inline " +
      "recomputes end-to-end (winnow + incremental)") {
    def rows(df: DataFrame): Map[Seq[Any], Int] =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val winnow = rows(graft.QueryRegistry.byName("q_winnow_matches").run(spark, sfDir))
    assert(winnow === rows(WinnowOps.inlineMatchesOver(spark, sfDir)))
    assert(winnow.nonEmpty)
    val incr = rows(graft.QueryRegistry.byName("q_dedup_incremental").run(spark, sfDir))
    assert(incr === rows(DedupOps.inlineIncrementalOver(spark, sfDir)))
  }
}
