package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Loader-side shuffle/sampling ([[ShuffleOps]]): permutation and
  * budget invariants the oracle's row hash can't articulate. */
class ShuffleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("shuffle shards: dense per-shard positions, full coverage, deterministic") {
    val m = QueryRegistry.byName("q_shuffle_shards").run(spark, dir).cache()
    try {
      val docs = graft.Tables.table(spark, dir, "documents")
      assert(m.count() === docs.count(), "every document is placed exactly once")
      assert(m.select(col("doc_id")).distinct().count() === m.count())
      // positions within a shard are exactly 1..n_shard
      val bad = m.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
          max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"))
        .filter(col("mn") =!= 1L || col("mx") =!= col("n") || col("nd") =!= col("n"))
      assert(bad.count() === 0, "per-shard positions must tile 1..n densely")
      // the hash spreads: all 16 shards occupied, none pathologically fat
      val sizes = m.groupBy(col("shard")).count().select(col("count")).collect().map(_.getLong(0))
      assert(sizes.length === 16, "all shards occupied")
      assert(sizes.max <= 2 * (m.count() / 16), "no shard beyond 2x the mean")
      // same seed replays bit for bit
      val again = QueryRegistry.byName("q_shuffle_shards").run(spark, dir)
      assert(m.exceptAll(again).isEmpty && again.exceptAll(m).isEmpty)
    } finally { m.unpersist(); () }
  }

  test("shuffle windows: every pack window placed once with dense per-shard positions") {
    val m = QueryRegistry.byName("q_shuffle_windows").run(spark, dir).cache()
    try {
      val wins = QueryRegistry.byName("q_pack_windows").run(spark, dir)
      assert(m.count() === wins.count(), "every training window placed exactly once")
      assert(m.select(col("source"), col("win_id")).distinct().count() === m.count())
      val bad = m.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
          max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"))
        .filter(col("mn") =!= 1L || col("mx") =!= col("n") || col("nd") =!= col("n"))
      assert(bad.count() === 0, "per-shard positions must tile 1..n densely")
    } finally { m.unpersist(); () }
  }

  test("epoch sample: budget respected per source and selection is a hash-order prefix") {
    val sel = QueryRegistry.byName("q_epoch_sample").run(spark, dir).cache()
    try {
      // recompute targets independently (the q_temperature_mix arithmetic)
      val toks = graft.Tables.table(spark, dir, "documents")
        .select(col("source"), size(split(trim(col("text")), " ")).cast("long").as("n"))
      val per = toks.groupBy(col("source")).agg(sum(col("n")).as("tokens"))
        .withColumn("w", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      val tgt = per.crossJoin(
          per.agg(sum(col("tokens")).as("total"), sum(col("w")).as("sum_w")))
        .select(col("source"), expr("(total * w) div sum_w").as("target"))
      // every selected doc STARTS inside the budget...
      val joined = sel.join(tgt, "source")
      assert(joined.filter(col("cum_toks") - col("n_toks") >= col("target")).count() === 0)
      // ...and the selection saturates it: the last selected doc per source
      // ends at or past the target (or the source was exhausted short of it)
      val last = joined.groupBy(col("source"))
        .agg(max(col("cum_toks")).as("sel_end"), first(col("target")).as("target"))
        .join(per.select(col("source"), col("tokens")), "source")
      assert(last.filter(col("sel_end") < col("target") &&
        col("sel_end") =!= col("tokens")).count() === 0,
        "selection must consume the budget unless the source ran out")
      // temperature effect: every source is represented
      assert(sel.select(col("source")).distinct().count() === per.count())
    } finally { sel.unpersist(); () }
  }

  test("mixture target arithmetic survives 100 TB magnitudes (no 2^63 wrap)") {
    import spark.implicits._
    // total ≈ 2.5e13 tokens, w ≈ √(source tokens) up to 5e6: total·w ≈ 1.2e20
    // would wrap past 2^63; the reduce-before-multiply form must equal the
    // exact BigInt quotient on every row
    val rows = Seq(
      (25_000_000_000_000L, 5_000_000L, 6_000_000L),
      (25_000_000_000_000L, 999_983L, 6_000_000L),
      (9_223_372_036_854_775L, 3_037_000L, 3_037_001L),
      (1_000_000L, 1_000L, 1_001L)) // small regime sanity
    val got = rows.toDF("total", "w", "sum_w")
      .select(col("total"), col("w"), col("sum_w"),
        expr("w * (total div sum_w) + (w * (total % sum_w)) div sum_w").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    for ((total, w, sumW) <- rows) {
      val exact = (BigInt(total) * BigInt(w) / BigInt(sumW)).toLong
      assert(got((total, w, sumW)) === exact, s"($total,$w,$sumW)")
    }
  }
}
