package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Sequence packing (concat-and-chunk): invariants any correct pack must
  * satisfy on ANY corpus, plus the two-level-scan ≡ naive-scan identity
  * (oracle equality at the gate is the hash check; this pins the
  * distributed prefix sum against the single-window formulation
  * directly). */
class PackingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val W = 256L

  private def run(name: String) = QueryRegistry.byName(name).run(spark, dir)

  test("two-level prefix sum ≡ naive per-source running sum, bit for bit") {
    val naive = graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n"))
      .withColumn("end_naive", sum(col("n")).over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), (col("end_naive") - col("n")).as("start_naive"))
    val bad = run("q_pack_chunks").join(naive, "doc_id")
      .filter(col("start_tok") =!= col("start_naive")).count()
    assert(bad === 0)
  }

  test("chunks: streams start at 0, are contiguous, and spans are sane") {
    val c = run("q_pack_chunks").cache()
    val perSource = c.groupBy(col("source"))
      .agg(min(col("start_tok")).as("mn"), sum(col("n_toks")).as("tot"),
        max(col("start_tok") + col("n_toks")).as("end"))
    // contiguity: the stream covers [0, Σ tokens) with no gap or overlap
    assert(perSource.filter(col("mn") =!= 0L || col("end") =!= col("tot")).count() === 0)
    assert(c.filter(col("n_wins") < 1L ||
      col("last_win") - col("first_win") + 1L =!= col("n_wins")).count() === 0)
    c.unpersist()
  }

  test("windows: dense ids, every window full except each source's last") {
    val w = run("q_pack_windows").cache()
    val perSource = w.groupBy(col("source"))
      .agg(count(lit(1)).as("nw"), max(col("win_id")).as("mx"),
        min(col("win_id")).as("mn"),
        sum(col("n_tokens")).as("filled"),
        sum(when(col("n_tokens") === W, 1L).otherwise(0L)).as("full"))
    assert(perSource.filter(col("mn") =!= 0L || col("mx") =!= col("nw") - 1).count() === 0,
      "window ids must be dense per source")
    // all windows full except possibly the last one per source
    assert(perSource.filter(col("full") < col("nw") - 1).count() === 0)
    // window fills account for every token exactly once
    val tokTotal = graft.Tables.table(spark, dir, "documents")
      .agg(sum(size(split(trim(col("text")), " ")).cast("long"))).head().getLong(0)
    assert(w.agg(sum(col("n_tokens"))).head().getLong(0) === tokTotal)
    w.unpersist()
  }
}
