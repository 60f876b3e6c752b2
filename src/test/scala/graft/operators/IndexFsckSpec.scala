package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Fleet health check + residue GC ([[IndexFsck]]): invariant findings
  * per family, and a gc that removes EXACTLY the residue no reader or
  * recovery path needs — staging (invisible by construction) and
  * completed-swap baks (live twin present) — while an orphan bak, the
  * only copy of a mid-swap crash, is reported `error` and never
  * touched. */
class IndexFsckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val docs = Seq(
    (1L, "hit f1 f2 f3", "en", "s0"),
    (2L, "hit hit f1 f2", "de", "s0"),
    (3L, "alpha beta beta delta", "en", "s1"))
    .toDF("doc_id", "text", "lang", "source")

  private def statuses(fs: Seq[IndexFsck.Finding]) =
    fs.map(f => f.check -> f.status).toMap

  test("healthy stores fsck clean; residue is triaged and gc removes only " +
      "the safe classes") {
    val base = tmp("graft-fsck")
    val idx = s"$base/search"
    SearchIndex.buildIndex(spark, docs, idx)
    assert(statuses(IndexFsck.fsck(spark, idx)) === Map("all" -> "ok"))

    // plant every residue class a crash can leave:
    def mkdir(p: String) = { new java.io.File(p).mkdirs(); () }
    mkdir(s"$idx/postings.parquet/.epoch-9.tmp")   // epoch staging
    mkdir(s"$idx/.term_df.tmp")                    // store-level staging
    mkdir(s"$idx/docs.parquet.compact-tmp")        // swap staging
    mkdir(s"$idx/docs.parquet.compact-bak")        // completed-swap bak (live exists)
    mkdir(s"$base/search.apply-bak")               // sibling bak, live store exists
    mkdir(s"$base/search.apply-tmp")               // sibling staging
    val found = statuses(IndexFsck.fsck(spark, idx))
    assert(found("residue_staging") === "info")
    assert(found("residue_bak") === "warn")
    assert(!found.contains("residue_bak_orphan"))

    val before = SearchIndex.bm25FromIndex(spark, idx, Seq("hit"), 10)
      .collect().map(_.toSeq).toSet
    // YOUNG staging is presumed an IN-FLIGHT writer's and skipped (the
    // r12 advisory: appends don't take the writer lock, so gc could
    // otherwise delete an in-progress .epoch-N.tmp from under them);
    // completed baks have the live-twin re-check instead and go now
    val early = IndexFsck.gc(spark, idx)
    assert(early.size === 2 && early.forall(_.contains("-bak")),
      s"fresh staging must survive gc: $early")
    // age the staging residue past the guard — a crashed writer's
    // leftovers only get older — and gc takes the rest
    def age(p: String) = {
      java.nio.file.Files.setLastModifiedTime(java.nio.file.Paths.get(p),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - IndexFsck.GcMinStagingAgeMs - 60000))
      ()
    }
    Seq(s"$idx/postings.parquet/.epoch-9.tmp", s"$idx/.term_df.tmp",
      s"$idx/docs.parquet.compact-tmp", s"$base/search.apply-tmp").foreach(age)
    val removed = IndexFsck.gc(spark, idx)
    assert(removed.size === 4, s"removed: $removed")
    assert(statuses(IndexFsck.fsck(spark, idx)) === Map("all" -> "ok"))
    // reads identical after gc
    assert(SearchIndex.bm25FromIndex(spark, idx, Seq("hit"), 10)
      .collect().map(_.toSeq).toSet === before)

    // the orphan bak: live twin GONE — the recovery copy. fsck screams,
    // gc refuses.
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$idx/docs.parquet"),
      new org.apache.hadoop.fs.Path(s"$idx/docs.parquet.compact-bak"))
    val orphaned = statuses(IndexFsck.fsck(spark, idx))
    assert(orphaned("residue_bak_orphan") === "error")
    assert(IndexFsck.gc(spark, idx).isEmpty,
      "gc must never touch a bak whose live twin is missing")
    assert(new java.io.File(s"$idx/docs.parquet.compact-bak").exists())
  }

  test("a live writer's lease surfaces as held (info); a crashed " +
      "holder's as stale (warn); a released one leaves no finding") {
    val base = tmp("graft-fscklease")
    val idx = s"$base/search"
    SearchIndex.buildIndex(spark, docs, idx)
    assert(!statuses(IndexFsck.fsck(spark, idx)).contains("lease_held"))
    val lease = java.nio.file.Paths.get(s"$idx.lease")
    java.nio.file.Files.writeString(lease, "424242@elsewhere#cafe\nspec\n")
    assert(statuses(IndexFsck.fsck(spark, idx))("lease_held") === "info")
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()
        - StoreLock.DefaultLeaseExpiryMs - 60000))
    assert(statuses(IndexFsck.fsck(spark, idx))("lease_stale") === "warn")
    java.nio.file.Files.delete(lease)
    assert(statuses(IndexFsck.fsck(spark, idx)) === Map("all" -> "ok"))
  }

  test("a MISSING store with a sibling bak — the mid-whole-store-swap " +
      "crash — surfaces the recovery copy; gc takes nothing") {
    val base = tmp("graft-fsck-gone")
    val lm = s"$base/lm"
    LmIndex.buildModel(spark, docs.select("doc_id", "text"), lm)
    // crash between applyWithSwap's two renames: live gone, bak is the store
    val fs = new org.apache.hadoop.fs.Path(lm)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(lm),
      new org.apache.hadoop.fs.Path(s"$lm.apply-bak"))
    val found = statuses(IndexFsck.fsck(spark, lm))
    assert(found("exists") === "error")
    assert(found("residue_bak_orphan") === "error",
      "the operator must be told the recovery copy exists")
    assert(IndexFsck.gc(spark, lm).isEmpty)
    assert(new java.io.File(s"$lm.apply-bak").exists())
  }

  test("family invariants surface: v1 search ledger, partial term_df, " +
      "legacy winnow, count-model crash residue, unknown store") {
    val base = tmp("graft-fsck-fam")

    // search: v1 ledger + partial summary
    val s1 = s"$base/search"
    SearchIndex.buildIndex(spark, docs, s1)
    for (e <- new java.io.File(s"$s1/docs.parquet").listFiles().map(_.getName)
        .filter(_.startsWith("epoch="))) {
      val ids = spark.read.parquet(s"$s1/docs.parquet/$e")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      AtomicPublish.stageAndRename(spark, s"$s1/docs.parquet", s".$e-v1.tmp", e) {
        t => ids.toDF("doc_id").write.mode("overwrite").parquet(t.toString)
      }
    }
    val td = new org.apache.hadoop.fs.Path(s"$s1/term_df.parquet")
    td.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(td, true)
    val sFound = statuses(IndexFsck.fsck(spark, s1))
    assert(sFound("docs_ledger_v1") === "error")
    assert(sFound("term_df_coverage") === "warn")

    // winnow: legacy (members-less, committed) vs crash window
    val w = s"$base/winnow"
    WinnowIndex.buildIndex(spark, docs.select("doc_id", "text"), w)
    val mem = new org.apache.hadoop.fs.Path(s"$w/members.parquet")
    mem.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mem, true)
    assert(statuses(IndexFsck.fsck(spark, w))("members_twin") === "error")

    // count model: counter epoch past the ledger commit point
    val lm = s"$base/lm"
    LmIndex.buildModel(spark, docs, lm)
    LmIndex.appendToModel(spark, lm, Seq((9L, "x y z x")).toDF("doc_id", "text"))
    val dp = new org.apache.hadoop.fs.Path(s"$lm/docs.parquet/epoch=1")
    dp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dp, true)
    assert(statuses(IndexFsck.fsck(spark, lm))("counter_orphans") === "warn")

    // unknown store: the sweep cannot cover it — fsck says so
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$base/mystery/stuff.parquet")
    assert(statuses(IndexFsck.fsck(spark, s"$base/mystery"))("family") === "error")

    // a required serving table missing: named error, not a mid-plan throw
    val ivf = s"$base/ivf"
    IvfIndex.buildIndex(spark, ivf,
      Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0)),
      Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    assert(!statuses(IndexFsck.fsck(spark, ivf)).contains("table_missing"))
    val cells = new org.apache.hadoop.fs.Path(s"$ivf/cells.parquet")
    cells.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(cells, true)
    val ivfFound = IndexFsck.fsck(spark, ivf)
    assert(statuses(ivfFound)("table_missing") === "error")
    assert(ivfFound.find(_.check == "table_missing").get.detail.contains("cells"))
  }
}
