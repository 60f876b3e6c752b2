package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchGuard]] — the contended-record detector. The round-14 driver
  * bench ran a whole ~36-minute window on a ~10×-degraded host and still
  * shipped `contended:false` because the old rule only compared the
  * post-suite sentinel to the pre-suite one; these pin the repaired
  * decision on the exact values from that record. */
class BenchGuardSpec extends AnyFunSuite {

  private val Floor = Some(0.594) // min across the committed records

  test("the r14 driver window (sentinel [9.036, 1.061]) flags contended " +
      "against the committed floor — the start-degraded failure mode") {
    assert(BenchGuard.contended(9.036, 1.061, Floor))
  }

  test("a quiet window at the committed floor does not flag") {
    assert(!BenchGuard.contended(0.8, 0.9, Floor))
    assert(!BenchGuard.contended(0.699, 0.839, Floor)) // the r9 record
  }

  test("mid-suite degradation still flags (the original after>2×before rule)") {
    assert(BenchGuard.contended(0.8, 2.0, Floor))
    assert(BenchGuard.contended(0.8, 2.0, None))
  }

  test("without a committed floor, a start-degraded window cannot be told " +
      "from a slow host — only the legacy rule applies") {
    assert(!BenchGuard.contended(9.0, 1.0, None))
  }

  test("failed sentinels (-1) never flag") {
    assert(!BenchGuard.contended(-1.0, 5.0, Floor))
    assert(!BenchGuard.contended(0.8, -1.0, None))
  }

  test("host factor normalizes only upward from the floor") {
    assert(math.abs(BenchGuard.hostFactor(9.036, Floor) - 9.036 / 0.594) < 1e-9)
    assert(BenchGuard.hostFactor(0.5, Floor) === 1.0)  // faster than floor
    assert(BenchGuard.hostFactor(9.0, None) === 1.0)
  }

  test("committedSentinelFloor reads driver-wrapped records and takes the " +
      "min positive value; an empty dir gives None") {
    val d = java.nio.file.Files.createTempDirectory("graft-bench-floor")
    assert(BenchGuard.committedSentinelFloor(Seq(d.toFile)).isEmpty)
    java.nio.file.Files.write(d.resolve("BENCH_r01.json"),
      """{"n":1,"parsed":{"sentinel":[8.432, 0.836],"value":85.44}}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(d.resolve("BENCH_r02.json"),
      """{"sentinel":[0.699,0.839]}""".getBytes("UTF-8"))
    java.nio.file.Files.write(d.resolve("not_a_bench.json"),
      """{"sentinel":[0.001,0.001]}""".getBytes("UTF-8"))
    assert(BenchGuard.committedSentinelFloor(Seq(d.toFile)) === Some(0.699))
  }

  test("the real repo's committed records yield a sub-1.3s floor (the " +
      "value the next driver run is judged against)") {
    val f = BenchGuard.committedSentinelFloor(Seq(new java.io.File("/root/repo")))
    assert(f.exists(v => v > 0.1 && v < 1.3), s"unexpected floor: $f")
  }

  // --- round-16 additions: 3-probe window, gated normalization, retry ---

  test("contendedProbes: the r15 driver window ([111.788, ?, 2.790]) flags " +
      "on probe disagreement alone, with or without a floor") {
    assert(BenchGuard.contendedProbes(Seq(111.788, 2.790), Floor))
    assert(BenchGuard.contendedProbes(Seq(111.788, 2.790), None))
    // quiet window: uniform probes at the floor
    assert(!BenchGuard.contendedProbes(Seq(0.8, 0.85, 0.9), Floor))
    // uniformly degraded window: probes agree but sit >2x the floor
    assert(BenchGuard.contendedProbes(Seq(5.0, 5.2, 4.9), Floor))
    assert(!BenchGuard.contendedProbes(Seq(5.0, 5.2, 4.9), None))
    // failed probes are ignored; all-failed never flags
    assert(!BenchGuard.contendedProbes(Seq(-1.0, 0.8, 0.9), Floor))
    assert(!BenchGuard.contendedProbes(Seq(-1.0, -1.0), Floor))
  }

  test("normalizedTotal: a bimodal window (the r15 record: pass totals " +
      "1439s vs 741s under sentinels [111.8, 2.79]) is explicitly " +
      "unreliable — None, never a precise-looking nonsense number") {
    assert(BenchGuard.normalizedTotal(436.5, Seq(111.788, 2.790), Floor).isEmpty)
    // uniform degraded window: normalization IS meaningful
    val n = BenchGuard.normalizedTotal(400.0, Seq(5.94, 5.0, 5.5), Floor)
    assert(n.exists(v => math.abs(v - 400.0 / (5.0 / 0.594)) < 1e-9))
    // quiet window: normalized by the (small) factor above the floor
    assert(BenchGuard.normalizedTotal(176.0, Seq(0.8, 0.9), Floor)
      .exists(v => math.abs(v - 176.0 / (0.8 / 0.594)) < 1e-9))
    // at/below the floor: factor 1, raw total passes through
    assert(BenchGuard.normalizedTotal(176.0, Seq(0.594, 0.6), Floor)
      .exists(v => math.abs(v - 176.0) < 1e-9))
    // no usable probes: no claim
    assert(BenchGuard.normalizedTotal(176.0, Seq(-1.0), Floor).isEmpty)
  }

  test("shouldRetryStart: a degraded-start probe retries (bounded), a " +
      "quiet one proceeds, and no floor disables the policy") {
    assert(BenchGuard.shouldRetryStart(9.0, Floor, 0, 3))
    assert(BenchGuard.shouldRetryStart(9.0, Floor, 2, 3))
    assert(!BenchGuard.shouldRetryStart(9.0, Floor, 3, 3), "bounded")
    assert(!BenchGuard.shouldRetryStart(0.8, Floor, 0, 3), "quiet start")
    assert(!BenchGuard.shouldRetryStart(9.0, None, 0, 3), "no floor")
    assert(!BenchGuard.shouldRetryStart(-1.0, Floor, 0, 3), "failed probe")
  }
}
