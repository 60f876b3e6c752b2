package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Takedown-at-scale measurement (round-12 verdict item 5): what a
  * 1k-victim compliance sweep actually costs against large stores, per
  * deletion-discipline class —
  *
  *  - TOMBSTONE (representative: [[operators.SearchIndex]], the heaviest
  *    read surface): O(ids) sweep; reads pay an anti-join while
  *    tombstones pend; the deletion-applying compact makes it durable;
  *  - COUNT-MODEL (representative: [[operators.LmIndex]]): O(victims)
  *    negative-epoch write; reads pay the pos−neg netting while the
  *    deletion pends; the whole-store-swap compact retires it;
  *  - SHINGLE-GRAPH (representative: [[operators.IncrementalDedup]]):
  *    the delete IS an atomic store rewrite (copy-weighted subtraction)
  *    — no pending state, so no read overhead and nothing for the
  *    compact to apply.
  *
  * Prints one JSON line per (class, phase): build, read_clean,
  * sweep, read_pending (and the overhead ratio), compact_apply,
  * read_after. Run:
  *
  *   sbt "runMain graft.TakedownBench /tmp/sfstress/f10 /tmp/tdbench"
  */
object TakedownBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TakedownBench <sfDir> <workDir>")
    val (sfDir, workDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // the committed record: a FLAT {"td_<class>_<phase>": sec} map in the
    // exact shape scripts/bench_diff.py diffs query lanes in, so
    // deletion-path regressions get the same adjudicated history as the
    // query suite (committed as takedown_bench_r{N}.json per round)
    val flat = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def emit(cls: String, phase: String, sec: Double, extra: String = ""): Unit = {
      flat(s"td_${cls}_$phase") = sec
      println(f"""{"class":"$cls","phase":"$phase","sec":$sec%.3f$extra,"sf":"$sfDir"}""")
    }

    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val nDocs = docs.count()
    // ~1000 victims, spread across the id range (residue stride-1 is
    // always satisfiable — `% stride === 7` silently selects NOTHING
    // when stride ≤ 7, i.e. corpora under ~8k docs)
    val stride = math.max(1L, nDocs / 1000L)
    val victims = docs.filter(col("doc_id") % stride === (stride - 1L)).cache()
    val nVictims = victims.count()
    require(nVictims > 0, s"victim selection came up empty (corpus $nDocs)")
    println(s"""{"corpus":$nDocs,"victims":$nVictims,"sf":"$sfDir"}""")

    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)

    // the deletion-writer lock+lease cycle in isolation (50 reps through
    // IndexFsck.gc on pre-created EMPTY dirs: qualify key, take lock,
    // create lease, heartbeat arm, one residue listing, release+delete
    // lease) — so the serialization layer's cost is a committed number,
    // not an argument, and a takedown-lane drift can be attributed or
    // cleared
    (1 to 50).foreach(i =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$workDir/lease-probe-$i")))
    val (_, lc) = timed((1 to 50).foreach { i =>
      operators.IndexFsck.gc(spark, s"$workDir/lease-probe-$i"); ()
    })
    emit("lease", "cycle_x50", lc)

    // --- lease CONTENTION (r13 verdict #7): the lease was measured
    // uncontended only; these three lanes make the fleet's worst-case
    // write latency under contention a number. The protocol is pure
    // filesystem metadata ops, so planted foreign leases measure the
    // same code path a real second driver exercises (ForkedLeaseSpec
    // pins the behavioral equivalence through a real process boundary).
    {
      val conf = spark.sparkContext.hadoopConfiguration

      // (a) handover: writer B queued on the in-process lock while A
      // holds; reported latency is B's acquire BEYOND A's body end —
      // the queueing + release (lease delete, heartbeat stop) +
      // re-acquire (lease create, verify) overhead itself
      val cdir = s"$workDir/lease-contended"
      fs.mkdirs(new org.apache.hadoop.fs.Path(cdir))
      val started = new java.util.concurrent.CountDownLatch(1)
      @volatile var aBodyEnd = 0L
      val a = new Thread(() =>
        operators.StoreLock.withLockConf(conf, cdir, "bench-writer-A") {
          started.countDown()
          Thread.sleep(300)
          aBodyEnd = System.nanoTime()
        })
      a.start(); started.await()
      // bAcq stamped INSIDE B's body: the handover number is A's release
      // + B's acquire only — stamping after withLockConf returns would
      // fold B's own release (lease delete, heartbeat stop) into a
      // metric named for the handover (review r14)
      var bAcq = 0L
      operators.StoreLock.withLockConf(conf, cdir, "bench-writer-B") {
        bAcq = System.nanoTime()
      }
      a.join()
      emit("lease", "contended_handover", (bAcq - aBodyEnd) / 1e9)

      // (b) refusal latency on a fresh FOREIGN lease (two drivers, one
      // store lineage): how fast the second driver learns it must not
      // write — 20 reps of read-owner + staleness judgment + throw
      val rdir = s"$workDir/lease-refused"
      fs.mkdirs(new org.apache.hadoop.fs.Path(rdir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$rdir.lease"),
        "99999@other-host#feedbeef\nbench-foreign-writer\n")
      val (_, rf) = timed((1 to 20).foreach { _ =>
        try {
          operators.StoreLock.withLockConf(conf, rdir, "bench-refused") { () }
          sys.error("foreign lease did not refuse")
        } catch { case _: operators.StoreLock.LeaseHeldException => () }
      })
      emit("lease", "refusal_x20", rf)

      // (c) waited acquire (the shared-ledger shape, leaseWaitMs): the
      // foreign holder releases ~250 ms in; B backoff-retries and wins.
      // Reported latency is B's whole acquire+release cycle — the
      // worst-case audit-ledger write stall under a momentary collision.
      val wdir = s"$workDir/lease-waited"
      fs.mkdirs(new org.apache.hadoop.fs.Path(wdir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$wdir.lease"),
        "99999@other-host#feedbeef\nbench-foreign-writer\n")
      val releaser = new Thread(() => {
        Thread.sleep(250)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(s"$wdir.lease"))
        ()
      })
      releaser.start()
      val (_, wl) = timed(
        operators.StoreLock.withLockConf(
          conf, wdir, "bench-waited", leaseWaitMs = 10000L) { () })
      releaser.join()
      emit("lease", "waited_acquire", wl)
    }

    // --- tombstone class: SearchIndex ------------------------------------
    {
      val idx = s"$workDir/search"
      val (_, tb) = timed(operators.SearchIndex.buildIndex(spark, docs, idx))
      emit("tombstone", "build", tb)
      val terms = Seq("vector", "window", "merge", "scan")
      def read(): Unit =
        operators.SearchIndex.bm25FromIndex(spark, idx, terms, 10)
          .write.mode("overwrite").format("noop").save()
      val (_, w) = timed(read()); emit("tombstone", "read_warm", w)
      val (_, r0) = timed(read()); emit("tombstone", "read_clean", r0)
      val (_, s) = timed(
        operators.Takedown.sweep(spark, victims, Seq(idx)))
      emit("tombstone", "sweep_1k", s)
      val (_, r1) = timed(read())
      emit("tombstone", "read_pending", r1,
        f""","overhead_vs_clean":${r1 / math.max(r0, 1e-9)}%.2f""")
      val (_, c) = timed(operators.SearchIndex.compact(spark, idx))
      emit("tombstone", "compact_apply", c)
      val (_, r2) = timed(read()); emit("tombstone", "read_after", r2)
    }

    // --- count-model class: LmIndex ---------------------------------------
    {
      val idx = s"$workDir/lm"
      val (_, tb) = timed(operators.LmIndex.buildModel(spark, docs, idx))
      emit("count-model", "build", tb)
      val probe = docs.filter(col("doc_id") % 97 === 3L)
        .select(col("doc_id"), col("text"))
      def read(): Unit =
        operators.LmIndex.scoreDocs(spark, probe, idx)
          .write.mode("overwrite").format("noop").save()
      val (_, w) = timed(read()); emit("count-model", "read_warm", w)
      val (_, r0) = timed(read()); emit("count-model", "read_clean", r0)
      val (_, s) = timed(
        operators.Takedown.sweep(spark, victims, Seq(idx)))
      emit("count-model", "sweep_1k", s)
      val (_, r1) = timed(read())
      emit("count-model", "read_pending", r1,
        f""","overhead_vs_clean":${r1 / math.max(r0, 1e-9)}%.2f""")
      val (_, c) = timed(operators.LmIndex.compact(spark, idx))
      emit("count-model", "compact_apply", c)
      val (_, r2) = timed(read()); emit("count-model", "read_after", r2)
    }

    // --- shingle-graph class: IncrementalDedup ----------------------------
    {
      val idx = s"$workDir/incdedup"
      val (_, tb) = timed(
        operators.IncrementalDedup.buildIndex(
          docs.select(col("doc_id"), col("text")), idx))
      emit("shingle-graph", "build", tb)
      // the delete IS the rewrite — one timed sweep, no pending state
      val (_, s) = timed(
        operators.Takedown.sweep(spark, victims, Seq(idx)))
      emit("shingle-graph", "sweep_1k_rewrite", s)
    }

    // --- pseudo-label class: the single-table Rewrite store ---------------
    {
      val outStore = s"$workDir/pseudo"
      // the STREAM's actual shape: a ~1k-vector micro-batch served from
      // the warm persisted IVF store (ensureIndex untimed — the one-time
      // build is the q_ann_ivf_indexed lane's number, not a per-batch
      // cost), then delete half the labeled ids
      val emb = Tables.table(spark, sfDir, "embeddings")
      val nVec = emb.count()
      val vstride = math.max(1L, nVec / 1000L)
      val batch = emb.filter(col("vec_id") % vstride === 0)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      operators.IvfIndex.ensureIndex(spark, sfDir)
      val (_, tb) = timed(
        streaming.DocStream.processPseudoLabelBatch(spark, sfDir, outStore, batch))
      emit("pseudo-label", "serve_and_append", tb)
      val vecVictims = batch.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("doc_id"))
      val (_, s) = timed(
        operators.Takedown.sweep(spark, vecVictims, Seq(outStore)))
      emit("pseudo-label", "sweep_half_rewrite", s)
      val (_, r) = timed(
        operators.PseudoLabelStore.residentVecIds(spark, outStore).count())
      emit("pseudo-label", "read_after", r)
    }

    victims.unpersist()
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val body = flat.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val out = java.nio.file.Paths.get("target/takedown_bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, body + "\n")
    System.err.println(s"[tdbench] flat record written to $out")
    spark.stop()
  }
}
