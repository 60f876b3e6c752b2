package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the query suite on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line.
  *
  * Methodology:
  *  - a warm-up query first, so JVM/codegen/session costs don't land on
  *    the first measured query;
  *  - each query materializes fully through the `noop` sink (count() would
  *    let Catalyst prune columns the query claims to produce);
  *  - headline queries (QueryDef.headline) run first in deterministic
  *    order, then the rest;
  *  - the whole suite is measured TWICE and each query reports its
  *    per-query minimum: a single measured pass lets transient host
  *    contention (another process stealing the cores for a few seconds)
  *    become the round's permanent record. The minimum of two passes is
  *    robust to one-sided noise — contention only ever adds time. Both
  *    raw pass totals are printed alongside for transparency;
  *  - a contention SENTINEL: the warm-up query is timed right after
  *    warm-up (min of 3 immediate reps — the baseline must be the host's
  *    floor, not whatever first-touch cost lands on rep 1, or the flag
  *    false-negatives) and once again after the last measured pass.
  *    Min-of-2
  *    rejects one-sided noise but not contention spanning both passes;
  *    a >2× regression of this fixed, trivial query flags the whole
  *    record as `"contended":true` so a hot-host run is never mistaken
  *    for a real slowdown. Per-query [min,max] spread is printed too —
  *    a wide spread localizes which queries absorbed the noise.
  */
/** Contention detection, factored out of [[Bench]] so the decision is
  * unit-testable (the round-14 driver record shipped a ~10×-degraded
  * window as `contended:false` because the old after>2×before rule is
  * blind to a run that STARTS degraded). */
object BenchGuard {
  /** Min positive sentinel value across every committed `BENCH_r*.json`
    * (the driver wraps Bench's line in a record, so a regex over the raw
    * text reads both shapes). This is the host's proven floor for the
    * fixed trivial sentinel plan — a pre-suite sentinel far above it
    * means the window is degraded no matter what the post-suite rep says. */
  def committedSentinelFloor(dirs: Seq[java.io.File]): Option[Double] = {
    val re = """"sentinel":\s*\[\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*\]""".r
    val vals = dirs.flatMap(d => Option(d.listFiles).toSeq.flatten)
      .filter(f => f.getName.startsWith("BENCH_r") && f.getName.endsWith(".json"))
      .distinct
      .flatMap { f =>
        val txt =
          try new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          catch { case _: Exception => "" }
        re.findAllMatchIn(txt)
          .flatMap(m => Seq(m.group(1), m.group(2)))
          .flatMap(s => scala.util.Try(s.toDouble).toOption)
      }
      .filter(_ > 0)
    if (vals.isEmpty) None else Some(vals.min)
  }

  /** Contended iff the window DEGRADED mid-suite (after > 2× before) OR
    * STARTED degraded (before > 2× the committed floor). */
  def contended(before: Double, after: Double, floor: Option[Double]): Boolean =
    (before > 0 && after > 0 && after > 2 * before) ||
      (before > 0 && floor.exists(f => before > 2 * f))

  /** Generalized over N probes (round 16 — the bench now takes a MID
    * sentinel between the two passes): contended iff the window changed
    * shape at any probe boundary (max > 2× min — catches degradation AND
    * recovery, including the no-floor start-degraded case the two-probe
    * rule was blind to) or sat uniformly degraded above the committed
    * floor (min > 2× floor). */
  def contendedProbes(probes: Seq[Double], floor: Option[Double]): Boolean = {
    val ok = probes.filter(_ > 0)
    ok.nonEmpty && (ok.max > 2 * ok.min || floor.exists(f => ok.min > 2 * f))
  }

  /** How many × slower than its committed floor the host ran this window
    * (1.0 when at/below the floor or no floor is known). Divides the raw
    * total into the sentinel-normalized one. */
  def hostFactor(before: Double, floor: Option[Double]): Double =
    floor match {
      case Some(f) if before > f && f > 0 => before / f
      case _ => 1.0
    }

  /** Sentinel-normalized total — ONLY when one factor can describe the
    * whole window: every positive probe within 2× of the others. The r15
    * driver record normalized a bimodal window (pass totals 1439 s vs
    * 741 s, sentinels [111.8, 2.79]) by its single pre-suite sentinel and
    * published a nonsense 2.3 s "normalized total"; a window whose probes
    * disagree >2× gets None — the record carries an explicit null plus
    * the probes, instead of noise wearing a precise name. */
  def normalizedTotal(
      total: Double, probes: Seq[Double], floor: Option[Double]): Option[Double] = {
    val ok = probes.filter(_ > 0)
    if (ok.isEmpty || ok.max > 2 * ok.min) None
    else Some(total / hostFactor(ok.min, floor))
  }

  /** Bounded degraded-start policy (r15 verdict: don't measure a window
    * the harness already knows is garbage): when the pre-suite probe
    * opens >2× the committed floor, wait and re-probe — up to
    * `maxRetries` times — before starting the ~30-minute suite. */
  def shouldRetryStart(
      probe: Double, floor: Option[Double],
      attempt: Int, maxRetries: Int): Boolean =
    attempt < maxRetries && probe > 0 && floor.exists(f => probe > 2 * f)
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // harness sizing for a single 128 GiB node: the stress-SF orders/
      // part tables (~14 MB) sit right at the default 10 MB broadcast
      // threshold, making AQE flip between broadcast and sort-merge run
      // to run; 64 MB keeps the decision stats-driven but stable here.
      // A real cluster sizes this to executor memory the same way.
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // store-root state BEFORE any query materializes an index: how many
    // persisted graft-* stores were already warm. Records carry it so a
    // cold-root record (every ensure* pays its build) is distinguishable
    // from a warm-serve one (the r14 q_curation2 driver anomaly was
    // undiagnosable without this).
    val storeDirsWarm = Option(new java.io.File(
      graft.operators.StoreRoot.root).listFiles).toSeq.flatten
      .count(f => f.isDirectory && f.getName.startsWith("graft-"))

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try QueryRegistry.byName(name).run(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may cache intra-query intermediates; drop them so 46
      // queries in one session don't accumulate executor memory
      spark.sharedState.cacheManager.clearCache()
      dt
    }

    // warm-up: touch EVERY table's parquet footer/reader (first-touch
    // footer reads otherwise land on whichever measured query reads that
    // table first), then one scan+agg to warm codegen/shuffle machinery
    Tables.All.foreach { t =>
      try { Tables.table(spark, sfDir, t).limit(1).collect(); () }
      catch { case _: Throwable => () }
    }
    // run the warm-up pass TWICE, plus one windowed query at the bench
    // SF: round-7's sentinel pair read [8.43, 0.84] — a single warm-up
    // didn't absorb first-pass JIT/codegen, so the contended flag's
    // baseline was 10× noisy. Two passes + a window plan stabilize it.
    (1 to 2).foreach { _ =>
      Seq("q1_pricing_summary", "q_running_revenue").foreach { n =>
        try QueryRegistry.byName(n).run(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
    }
    // JIT warm-up of the heavier execution machinery (higher-order
    // lambdas, window frames, iterative joins, native expressions) on the
    // TINY sf0.001 fixture — cold-JIT otherwise lands on the first
    // measured query using each code path (2-5× observed)
    val tiny = "/root/testdata/sf0.001"
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(tiny)))
      Seq("q_text_stats", "q_sessionize", "q_dedup_ngram_jaccard",
          "q_ann_lsh", "q_dedup_minhash_verified").foreach { n =>
        try {
          QueryRegistry.byName(n).run(spark, tiny)
            .write.mode("overwrite").format("noop").save()
          spark.sharedState.cacheManager.clearCache()
        } catch { case _: Throwable => () }
      }

    // sentinel baseline: the warm-up query is already hot, so this is a
    // pure measurement of how fast the host runs a trivial fixed plan NOW.
    // MIN OF 3 immediate repetitions: the double warm-up didn't absorb
    // first-touch costs in the driver environment (r8 recorded sentinel
    // [9.713, 0.691] there vs [0.89, 0.86] locally), and an inflated
    // BEFORE makes `contended` false-negative — min-of-3 pins the
    // baseline to the host's true floor whatever lands on rep 1
    val sentinelQuery = "q1_pricing_summary"
    def sentinelProbe(): Double =
      (1 to 3).map(_ => materialize(sentinelQuery)).filter(_ >= 0) match {
        case Seq() => -1.0
        case ok => ok.min
      }
    // floor resolved BEFORE the suite (the degraded-start policy needs
    // it); dirs: explicit env override, the cwd, and the canonical repo
    // checkout — all recorded so a missing floor is diagnosable from the
    // record instead of silently disabling the start-degraded check
    val floorDirs = (sys.env.get("SPARK_GRAFT_REPO_ROOT").toSeq ++
      Seq(".", "/root/repo"))
      .map(new java.io.File(_).getCanonicalFile).distinct
    val floor = BenchGuard.committedSentinelFloor(floorDirs)
    // degraded-start policy (r15 verdict #3): three consecutive driver
    // windows opened >2× the committed floor and the harness measured a
    // ~36-minute suite it already knew was garbage. Retry the probe
    // (bounded: 3× over ~2 min) before starting; record the wait.
    var sentinelBefore = sentinelProbe()
    val startProbes = scala.collection.mutable.ArrayBuffer(sentinelBefore)
    val StartRetryWaitMs = 40000L
    var startRetries = 0
    while (BenchGuard.shouldRetryStart(sentinelBefore, floor, startRetries, 3)) {
      System.err.println(f"[bench] pre-suite sentinel $sentinelBefore%.3f s " +
        f"opens >2x the committed floor ${floor.getOrElse(-1.0)}%.3f s — " +
        s"waiting ${StartRetryWaitMs / 1000} s and re-probing")
      Thread.sleep(StartRetryWaitMs)
      startRetries += 1
      sentinelBefore = sentinelProbe()
      startProbes += sentinelBefore
    }

    // dev-only subset filter (comma-separated names); the driver never
    // sets it, so official records always cover the full registry
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = QueryRegistry.all.sortBy(q => (!q.headline, q.name)).map(_.name)
      .filter(n => only.forall(_.contains(n)))
    val pass1 = ordered.map(n => n -> materialize(n))
    // MID sentinel between the passes (round 16): one pre-suite probe
    // cannot describe a bimodal window (the r15 driver window's pass
    // totals were 1439 s vs 741 s); three probes bound each pass on both
    // sides, drive the generalized contended rule, and gate whether a
    // normalized total is meaningful at all
    val sentinelMid = materialize(sentinelQuery)
    val pass2 = ordered.map(n => n -> materialize(n))

    // sentinel re-run + committed-floor check: flagged if the trivial
    // plan changed shape >2× across any probe boundary OR the window sat
    // uniformly >2× off the repo's committed sentinel floor (the r14
    // driver failure mode — a whole-window-degraded host read
    // `contended:false`)
    val sentinelAfter = materialize(sentinelQuery)
    val probes = Seq(sentinelBefore, sentinelMid, sentinelAfter)
    val contended = BenchGuard.contendedProbes(probes, floor)
    val hostFactor = BenchGuard.hostFactor(sentinelBefore, floor)
    // the factor total_normalized actually divides by (min positive
    // probe) — emitted beside the legacy pre-suite-probe host_factor so
    // the record is self-consistent: value/host_factor_norm ==
    // total_normalized whenever normalized_reliable (ADVICE r16)
    val hostFactorNorm = probes.filter(_ > 0) match {
      case Seq() => 1.0
      case ok => BenchGuard.hostFactor(ok.min, floor)
    }

    // per-query min of the two passes; a query that failed in one pass
    // reports the other pass's time, and -1 only if it failed in both
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      val valid = Seq(a, b).filter(_ >= 0)
      n -> (if (valid.isEmpty) -1.0 else valid.min)
    }
    // the one-line record must survive the driver's output-capture limit:
    // r04 truncated mid-`spread`, and r05 — with spread already in a side
    // file — STILL truncated (`parsed: null`, first ~13 per-query entries
    // lost), so a 99-query inline map simply doesn't fit. The line now
    // carries only totals + pass totals + sentinel + contended + the top-5
    // slowest queries (the ones a reader triages first); the FULL per-query
    // map and the [min,max] spread both live in side files.
    // Locale.ROOT formatting: the default-locale f"" interpolator writes
    // comma decimal separators under e.g. de_DE, producing invalid JSON.
    def ms(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val top5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // lanes whose cost is TRAINING/ablation by design — inline twins that
    // re-train or re-derive per run what production amortizes into a
    // persisted store, kept in the suite for the indexed≡inline
    // certificates (q_ann_pq_wide trains a 128-dim codebook; the dedup
    // inline twins re-shingle the corpus their _indexed twins serve from
    // the store). Labeled so a top-5 board separates by-design training
    // cost from a serving regression; top5_serving is the same board
    // with them excluded. q_curation2 left the set in round 14,
    // q_dedup_canonical in round 15, and q_dedup_clusters /
    // q_dedup_incremental / q_winnow_matches in round 16 (the r15 verdict's
    // task 5): their inline retrains now run once per sample universe
    // (recorded digest certificates), so their recurring cost IS a serving
    // cost — the store-backed full output plus the digest-re-proven
    // indexed sample output.
    val ablationLanes = Set("q_ann_pq_wide", "q_substring_dedup")
    val top5Serving = results
      .filter { case (k, v) => v >= 0 && !ablationLanes.contains(k) }
      .sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val ablationJson = ablationLanes.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // rows-only lanes labeled certified-by-twin (the one shared map —
    // same legibility move as ablation_lanes)
    val certifiedJson = QueryRegistry.certifiedByTwin
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val spread = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      val valid = Seq(a, b).filter(_ >= 0)
      val (lo, hi) = if (valid.isEmpty) (-1.0, -1.0) else (valid.min, valid.max)
      "\"" + n + "\":[" + ms(lo) + "," + ms(hi) + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    def passTotal(p: Seq[(String, Double)]) = p.map(_._2).filter(_ >= 0).sum
    val t1 = passTotal(pass1); val t2 = passTotal(pass2)
    def sideFile(name: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(s"target/$name")
      try {
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          (body + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[bench] $name written to $p")
      } catch { case e: Exception =>
        System.err.println(s"[bench] $name not written: ${e.getMessage}")
      }
    }
    sideFile("bench_queries.json", qs)
    sideFile("bench_spread.json", spread)
    // environment stamp: r14's BENCH/CORRECTNESS conflicts were
    // unadjudicable partly because records carried no env — say which
    // JVM/Spark/host shape produced the number and whether the store
    // root started warm
    val sparkVer = org.apache.spark.SPARK_VERSION
    val env = s"""{"jvm":"${System.getProperty("java.version")}",""" +
      s""""spark":"$sparkVer",""" +
      s""""cpus_avail":${Runtime.getRuntime.availableProcessors},""" +
      s""""store_dirs_warm":$storeDirsWarm}"""
    val floorJson = floor.map(ms).getOrElse("null")
    val floorDirsJson = floorDirs.map("\"" + _.getPath + "\"")
      .mkString("[", ",", "]")
    // sentinel-normalized total: the raw total divided by how many × the
    // window's sentinels sat above the committed floor — but ONLY when
    // the window was uniform enough for one factor to describe it
    // (probes within 2×); a bimodal window records an explicit null
    // instead of the r15 record's noise wearing a precise name
    val totalNorm = BenchGuard.normalizedTotal(total, probes, floor)
    val totalNormJson = totalNorm.map(ms).getOrElse("null")
    val startWait = s"""{"retries":$startRetries,""" +
      s""""waited_sec":${ms(startRetries * StartRetryWaitMs / 1000.0)},""" +
      s""""probes":${startProbes.map(ms).mkString("[", ",", "]")}}"""
    // stop BEFORE printing the record: the JSON line must be the last
    // output of the whole invocation even under a combined stdout+stderr
    // capture, so nothing Spark logs during shutdown may follow it
    spark.stop()
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":$failed,"pass_totals":[${ms(t1)},${ms(t2)}],"sentinel":[${ms(sentinelBefore)},${ms(sentinelAfter)}],"sentinels":${probes.map(ms).mkString("[", ",", "]")},"sentinel_floor":$floorJson,"floor_dirs":$floorDirsJson,"host_factor":${ms(hostFactor)},"host_factor_norm":${ms(hostFactorNorm)},"total_normalized":$totalNormJson,"normalized_reliable":${totalNorm.isDefined},"start_wait":$startWait,"contended":$contended,"env":$env,"top5_slowest":$top5,"top5_serving":$top5Serving,"ablation_lanes":$ablationJson,"certified_by_twin":$certifiedJson,"queries_file":"target/bench_queries.json"}""")
  }
}
