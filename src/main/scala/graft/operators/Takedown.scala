package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One compliance takedown, fanned out across EVERY persisted store — the
  * operational face of the per-family deletion paths: a real deletion
  * request ("remove these documents") is a whole-pipeline property, and
  * asking the operator to remember fourteen `deleteFrom*` signatures is
  * how one store gets missed. [[sweep]] detects each store's family by
  * its table signature (the [[graft.IndexCatalog]] map), shapes the
  * victim rows to what that family's deletion needs (ids for doc-keyed
  * stores, full rows for the count models whose counters are not
  * doc-attributed, vec_id for the vector stores — doc_id ≡ vec_id by the
  * corpus contract), applies it, and reports per store.
  *
  * The tokenizer store is reported `retrain_required`, not deleted: its
  * model is a FROZEN corpus-global merge table — a document cannot be
  * un-trained from a BPE vocabulary, and pretending otherwise would be a
  * compliance hole. The family's existing two-rename retrain from the
  * remaining corpus is the documented path.
  *
  * Deletions are applied with each family's own semantics (immediate
  * read-path exclusion; durability at the next compact), so a sweep
  * followed by the maintenance loop's compacts leaves every store
  * bit-identical to one rebuilt without the victims — exactly what the
  * per-family delete specs pin. Single deletion writer, serialized with
  * maintenance ([[Tombstones.delete]] constraint).
  */
object Takedown {

  /** Per-store outcome. `unresolved` counts victim ids that are RESIDENT
    * in a count-model store but could not be resolved to their document
    * rows (id-only request, id absent from the corpus): those stores
    * cannot reverse their arithmetic for them, so the sweep reports the
    * hole instead of silently subtracting nothing. Doc/vector-keyed
    * stores delete by id alone and never report unresolved. */
  final case class StoreResult(
      dir: String, family: String, action: String, unresolved: Long = 0L)

  /** Victim columns the count-model families reverse their arithmetic
    * from (LM/span: text; classifier/DSIR: text+lang; sketch: source). */
  private val ResolvedCols = Seq("text", "lang", "source")

  /** Resolve a takedown request to full victim rows. Requests carrying
    * text/lang/source pass through; id-only (or partial) requests are
    * left-joined against `corpus` (the curation stream's corpus table or
    * a caller-supplied documents table) to recover them — real
    * compliance requests carry bare ids. Returns (resolved rows,
    * unresolvable ids) — the second only on the resolution path. */
  private def resolveVictims(
      spark: SparkSession, docRows: DataFrame,
      corpus: Option[DataFrame]): (DataFrame, Option[DataFrame]) = {
    val have = docRows.columns.toSet
    if (ResolvedCols.forall(have.contains)) (docRows, None)
    else corpus match {
      case None => throw new IllegalArgumentException(
        s"takedown request carries only [${docRows.columns.mkString(",")}] — " +
          "the count models need text/lang/source to reverse their " +
          "arithmetic; pass corpus= to resolve id-only requests")
      case Some(c) =>
        val avail = ResolvedCols.filter(c.columns.contains)
        val marked = docRows.select(col("doc_id")).distinct().join(
          c.select(col("doc_id") +: avail.map(col) :+ lit(true).as("_resolved"): _*)
            .dropDuplicates("doc_id"),
          Seq("doc_id"), "left")
        (marked.filter(col("_resolved")).drop("_resolved"),
          Some(marked.filter(col("_resolved").isNull).select(col("doc_id"))))
    }
  }

  /** A sweep covered stores it could not identify. Thrown AFTER the
    * known stores' deletions were applied (one unidentifiable dir must
    * not block the other thirteen families' takedowns); `results`
    * carries the full per-store report including the error rows. */
  final case class UnknownStoreException(results: Seq[StoreResult])
      extends IllegalStateException(
        "takedown sweep cannot identify the family of: " +
          results.filter(_.action == "error_unknown_family")
            .map(_.dir).mkString(", ") +
          " — deletions were applied to the identified stores, but a " +
          "compliance sweep that skips a store is a deletion hole")

  /** One or more stores' deletions (or `applyNow` retirements) THREW (a
    * corrupt table, a wedged lock). Like [[UnknownStoreException]],
    * raised only after every other store's deletion was attempted — a
    * broken store must not block the remaining families — with the full
    * report attached; the failed stores' rows carry
    * `error_delete_failed: <cause>` (the deletion itself threw) or
    * `error_apply_failed: <cause>` (the deletion APPLIED — reads are
    * already correct — but the requested pending-state retirement
    * compact threw; re-delivery retires it, the delete replays as a
    * no-op). */
  final case class StoreErrorException(results: Seq[StoreResult])
      extends IllegalStateException(
        "takedown failed on: " +
          results.filter(r => r.action.startsWith("error_delete_failed") ||
              r.action.startsWith("error_apply_failed"))
            .map(r => s"${r.dir} (${r.action})").mkString("; ") +
          " — deletions were applied to every other store; re-deliver " +
          "the request after repairing (per-family deletes are " +
          "replay-idempotent)")

  /** Apply one takedown batch to every store under `indexDirs`.
    * `docRows` carries the victim documents (doc_id required; text/lang/
    * source where the corpus has them — the count models need the rows
    * to reverse their arithmetic). Returns what happened per store.
    *
    * A dir whose family cannot be detected is an ERROR, not a skip
    * (`error_unknown_family` + [[UnknownStoreException]] when
    * `failOnUnknown`, the default): the signature registry is
    * [[graft.IndexCatalog.Families]], shared with the catalog, so
    * detection cannot drift per consumer — but a store of a genuinely
    * new family must fail the sweep loudly until the registry and a
    * deletion handler cover it. */
  def sweep(
      spark: SparkSession, docRows: DataFrame,
      indexDirs: Seq[String], failOnUnknown: Boolean = true,
      corpus: Option[DataFrame] = None,
      applyNow: Boolean = false): Seq[StoreResult] = {
    import graft.IndexCatalog.Discipline._
    // doc/vector-keyed stores delete by id alone — ALL requested ids,
    // resolved or not; only the count models need the full rows
    val ids = docRows.select(col("doc_id")).distinct()
    val vecIds = ids.select(col("doc_id").as("vec_id"))
    val famByDir = indexDirs.map(dir =>
      dir -> graft.IndexCatalog.detectFamilyDef(spark, dir))
    // resolve (and require a corpus) ONLY when a count-model store is
    // actually being swept — an id-only request against doc/vector-keyed
    // stores needs no rows and must not be refused. The count set is the
    // registry's own discipline column, not a hand-maintained twin.
    val (rows, unresolvedRaw) =
      if (famByDir.exists(_._2.exists(_.discipline.isInstanceOf[Count])))
        resolveVictims(spark, docRows, corpus)
      else (docRows, None)
    val unresolvedIds = unresolvedRaw.map(_.persist())
    // a replayed request (at-least-once stream) or a never-resident id
    // must not append PHANTOM tombstone epochs: they would force a full
    // one-epoch compact of every table on every maintenance cycle for a
    // deletion that removes nothing (and keep tombstone-aware reads on
    // their slow paths). Filter to ids the store can still see: present
    // in its resident set (where the family keeps one) and not already
    // tombstoned. The count families do this internally (NegEpochs
    // victims); tombstone families get it here.
    def live(keyed: DataFrame, keyCol: String,
        resident: Option[DataFrame], dir: String): DataFrame = {
      val r = resident.fold(keyed)(res =>
        keyed.join(res.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi"))
      Tombstones.minus(spark, dir, r, keyCol)
    }
    def tombDelete(dir: String, keyed: DataFrame, keyCol: String,
        resident: Option[DataFrame]): String = {
      val fresh = live(keyed, keyCol, resident, dir).persist()
      try {
        if (fresh.isEmpty) "noop"
        else { Tombstones.delete(spark, dir, fresh, keyCol); "deleted" }
      } finally { fresh.unpersist(); () }
    }
    def has(dir: String, table: String): Boolean = {
      val p = new Path(dir, table)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val results = famByDir.map {
      case (dir, None) =>
        // registry-level failure: no signature row matches, so the store
        // has no discipline, no handler, no compact — reported before any
        // family-specific code could half-run
        StoreResult(dir, "unknown", "error_unknown_family", 0L)
      case (dir, Some(fam)) =>
        def vecResident(table: String): Option[DataFrame] =
          if (has(dir, table))
            Some(spark.read.parquet(s"$dir/$table").select(col("vec_id")))
          else None
        // an id the corpus could not resolve but the store still holds:
        // the count model's arithmetic cannot run in reverse for it — a
        // reported deletion hole, never a silent no-op. The post-delete
        // resident read is OUTSIDE the delete's failure domain: a
        // transient error here must not record an APPLIED deletion as
        // failed in the audit ledger — unresolved = -1 means "applied,
        // hole count unknown"
        def countUnresolved(resident: => DataFrame): Long =
          try unresolvedIds.fold(0L)(u =>
            u.join(resident.select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_semi").count())
          catch { case scala.util.control.NonFatal(_) => -1L }
        // one store's failure (corrupt table, wedged lock) must not block
        // the remaining families' deletions: isolate it to an error row,
        // finish the sweep, THEN raise with the full report attached.
        // Dispatch is the registry row's own discipline — there are no
        // per-family match arms left to drift from it.
        val (action0, unres) = try fam.discipline match {
          case TombstoneVec(residentTable) =>
            (tombDelete(dir, vecIds, "vec_id", vecResident(residentTable)), 0L)
          case TombstoneDoc(resident) =>
            (tombDelete(dir, ids, "doc_id", Some(resident(spark, dir))), 0L)
          case Rewrite(delete) =>
            delete(spark, dir, ids); ("deleted", 0L)
          case Count(delete, resident) =>
            delete(spark, dir, rows)
            ("deleted", countUnresolved(resident(spark, dir)))
          case Retrain => ("retrain_required", 0L)
        } catch {
          case scala.util.control.NonFatal(e) =>
            (s"error_delete_failed: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}", 0L)
        }
        // applyNow: retire the store's pending deletion state in the same
        // sweep — the path for stores under NO maintenance stream, whose
        // tombstones/neg-epochs would otherwise pend (and tax every read)
        // until an operator ran a compact by hand. Runs the registry
        // row's own deletion-applying compact, and only when there is
        // anything to retire (this request's, or an earlier sweep's).
        // Failure here is its own error class: the DELETION applied —
        // reads are already correct — only the retirement failed.
        val action =
          if (!applyNow || !Seq("deleted", "noop").contains(action0)) action0
          else fam.compact match {
            case Some(c) if IndexPolicy.pendingDeletes(spark, dir) =>
              try { c(spark, dir); action0 + "_applied" }
              catch {
                case scala.util.control.NonFatal(e) =>
                  s"error_apply_failed: ${e.getClass.getSimpleName}: " +
                    s"${Option(e.getMessage).getOrElse("").take(200)}"
              }
            case _ => action0
          }
        StoreResult(dir, fam.name, action, unres)
    }
    unresolvedIds.foreach { u => u.unpersist(); () }
    if (failOnUnknown && results.exists(_.action == "error_unknown_family"))
      throw UnknownStoreException(results)
    if (results.exists(r => r.action.startsWith("error_delete_failed") ||
        r.action.startsWith("error_apply_failed")))
      throw StoreErrorException(results)
    results
  }

  /** [[sweep]] with a persisted AUDIT ledger: compliance needs the record
    * of what a request did to every store, not just a callback that
    * evaporates with the driver. One epoch per sweep attempt under
    * `logDir` — rows (request_id, dir, family, action, unresolved,
    * n_victims) — written AFTER the deletions applied (the ledger records
    * outcomes, not intents) via the family staging discipline, and
    * written EVEN when the sweep raises (the exception rows carry the
    * partial outcome — exactly what an auditor asks for after a failure).
    * No wall clock anywhere: the epoch number is the attempt order, so
    * replayed requests append attempts rather than overwriting history.
    * Single compliance writer per ledger (the epoch numbering
    * constraint every store shares). */
  def sweepLogged(
      spark: SparkSession, requestId: String, docRows: DataFrame,
      indexDirs: Seq[String], logDir: String,
      failOnUnknown: Boolean = true,
      corpus: Option[DataFrame] = None,
      applyNow: Boolean = false): Seq[StoreResult] = {
    def log(rs: Seq[StoreResult]): Unit = {
      val n = docRows.select(col("doc_id")).distinct().count()
      // the epoch number is read-modify-write (max + 1), so the write
      // runs under the ledger dir's StoreLock + lease — two compliance
      // writers (threads OR drivers) logging to one logDir would
      // otherwise scan the same max and the second stageAndRename would
      // silently REPLACE the first attempt's history. Same mechanism,
      // same loudness as the store writers'.
      // leaseWaitMs: two drivers sweeping DISJOINT stores but sharing
      // one audit logDir collide only for one small parquet write —
      // retry the lease with backoff instead of turning the moment into
      // an AuditLogException (deletions applied, log lost) (advice r13)
      StoreLock.withLock(spark, logDir, "audit-log",
        leaseWaitMs = java.util.concurrent.TimeUnit.MINUTES.toMillis(2)) {
        val next = EpochLedger.epochs(spark, logDir).foldLeft(-1)(math.max) + 1
        val session = spark
        import session.implicits._
        AtomicPublish.stageAndRename(
          spark, logDir, s".epoch-$next.tmp", s"epoch=$next") { tmp =>
          rs.map(r => (requestId, r.dir, r.family, r.action, r.unresolved, n))
            .toDF("request_id", "dir", "family", "action", "unresolved", "n_victims")
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
        }
      }
    }
    // the ledger write must never MASK the sweep's own outcome: deletions
    // were already applied, and the original exception carries the report
    // the streaming lane delivers to the compliance callback. A failed
    // log on a SUCCESSFUL sweep is still loud (compliance cannot prove
    // the outcome) — AuditLogException, with the results attached.
    def logKeeping[T <: Throwable](rs: Seq[StoreResult], original: T): T = {
      try log(rs)
      catch { case scala.util.control.NonFatal(le) => original.addSuppressed(le) }
      original
    }
    try {
      val rs = sweep(spark, docRows, indexDirs, failOnUnknown, corpus, applyNow)
      try log(rs)
      catch {
        case scala.util.control.NonFatal(le) => throw AuditLogException(rs, le)
      }
      rs
    } catch {
      case e: UnknownStoreException => throw logKeeping(e.results, e)
      case e: StoreErrorException => throw logKeeping(e.results, e)
    }
  }

  /** The sweep APPLIED but its audit-ledger write failed — compliance
    * cannot prove the outcome, so this is loud; `results` carries the
    * applied per-store report (the streaming lane still delivers it to
    * the callback before rethrowing), and a re-delivered request is the
    * safe repair (idempotent deletes + a fresh log attempt). */
  final case class AuditLogException(results: Seq[StoreResult], cause: Throwable)
      extends IllegalStateException(
        s"takedown applied but the audit-ledger write failed: ${cause.getMessage}",
        cause)

  /** The audit ledger, attempts in epoch order (`attempt` = the epoch
    * partition column). Empty frame with the right schema if nothing
    * was ever logged. */
  def sweepLog(spark: SparkSession, logDir: String): DataFrame =
    if (EpochLedger.epochs(spark, logDir).isEmpty) {
      val session = spark
      import session.implicits._
      Seq.empty[(String, String, String, String, Long, Long, Int)]
        .toDF("request_id", "dir", "family", "action", "unresolved",
          "n_victims", "attempt")
    } else
      spark.read.parquet(logDir).withColumnRenamed("epoch", "attempt")
}
