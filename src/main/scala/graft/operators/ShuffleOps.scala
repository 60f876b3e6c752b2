package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Epoch-seeded corpus shuffle and budgeted epoch sampling — the two
  * loader-side randomization steps between a curated corpus and a
  * training run:
  *
  *  - `q_shuffle_shards`: the GLOBAL SHUFFLE. Every document gets a
  *    deterministic pseudorandom key (Knuth multiplicative hash of
  *    doc_id mixed with the epoch seed — the q_stratified_sample
  *    portable-hash convention), shard = key mod NumShards, and the
  *    manifest records each document's position within its shard in
  *    key order. A new seed is a new permutation; the same seed
  *    replays bit-for-bit (restartable data loading).
  *  - `q_epoch_sample`: WHAT each epoch reads. Per-source token
  *    targets come from the α=1/2 temperature mixture
  *    (q_temperature_mix's integer-exact arithmetic, inlined), and
  *    each source contributes its documents in hash order until the
  *    target is exhausted — a document is selected iff its stream
  *    start offset lies inside the budget, so small sources upsample
  *    toward their temperature share and the selected set is a
  *    deterministic function of (corpus, seed).
  *
  * Scale shape — no global sort, no per-shard funnel: the naive
  * formulation of "position within shard" is ROW_NUMBER over the whole
  * shard (N/S rows through ONE task) and the naive "running tokens in
  * hash order" is a per-source running SUM (whole source through one
  * task). Both reuse the [[PackingOps]] two-level scan instead, with
  * KEY-RANGE buckets: bucket = skey div (keyspace/1024) is a monotone
  * function of the sort key, so ordering (bucket, skey, doc_id) equals
  * ordering (skey, doc_id) and the within-bucket ranks/sums shift by a
  * broadcast bucket-offset relation (shards-or-sources × occupied
  * buckets, bounded by construction). Integer addition and ROW_NUMBER
  * over aligned buckets reassociate exactly, so both lanes match their
  * naive single-window DuckDB oracles bit for bit.
  *
  * Determinism: all arithmetic is BIGINT; doc_id folds through mod 2^31
  * before the multiply, and the mixture target uses the reduce-before-
  * multiply form (w·(total div Σw) + (w·(total mod Σw)) div Σw) instead
  * of total·w div Σw, so every intermediate stays below 2^63 in both
  * engines at 100 TB token counts (DuckDB errors on overflow; Spark
  * wraps — neither is reached).
  */
object ShuffleOps {
  import Tables.table

  /** Training shards per epoch. */
  private val NumShards = 16L

  /** Epoch seed — a different seed is a different permutation. */
  private val Seed = 1L

  /** Key-range buckets for the two-level scan (level-1 parallelism). */
  private val KeyBuckets = 1024L

  private val KeySpace = 4294967296L // 2^32
  private val BucketWidth = KeySpace / KeyBuckets

  /** The portable epoch key: Knuth multiplicative hash over doc_id ⊕
    * seed, identical arithmetic in Spark and DuckDB. */
  private def skeyExpr: String =
    s"((doc_id % 2147483648L) * 2654435761L + ${Seed}L * 40503L) % ${KeySpace}L"

  private def skeySql: String =
    s"((doc_id % 2147483648) * 2654435761 + $Seed * 40503) % $KeySpace"

  // --- q_shuffle_shards: epoch-seeded shard + position manifest ----------
  private def qShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val keyed = table(spark, dir, "documents")
      .select(col("doc_id"), expr(skeyExpr).as("skey"))
      .withColumn("shard", expr(s"skey % ${NumShards}L"))
      .withColumn("bucket", expr(s"skey div ${BucketWidth}L"))
    val w1 = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("skey"), col("doc_id"))
    val within = keyed.withColumn("rn_in", row_number().over(w1).cast(LongType))
    // bucket offsets: shards × occupied key-range buckets, tiny relation
    val w2 = Window.partitionBy(col("shard")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = keyed.groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(w2), lit(0L)))
      .select(col("shard"), col("bucket"), col("boff"))
    within.join(broadcast(boff), Seq("shard", "bucket"))
      .select(col("doc_id"), col("shard"), (col("rn_in") + col("boff")).as("pos"))
  }

  private val qShuffleShardsSql =
    s"""WITH k AS (
       |  SELECT doc_id, $skeySql AS skey FROM documents)
       |SELECT doc_id, skey % $NumShards AS shard,
       |  ROW_NUMBER() OVER (PARTITION BY skey % $NumShards
       |    ORDER BY skey, doc_id) AS pos
       |FROM k""".stripMargin

  // --- q_epoch_sample: temperature-budgeted selection in hash order ------
  private def qEpochSample(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_toks"),
        expr(skeyExpr).as("skey"))
      .withColumn("bucket", expr(s"skey div ${BucketWidth}L"))
    // the q_temperature_mix targets, inlined (same integer arithmetic)
    val perSource = toks.groupBy(col("source")).agg(sum(col("n_toks")).as("tokens"))
      .withColumn("w", floor(sqrt(col("tokens").cast("double"))).cast(LongType))
    val targets = perSource
      .crossJoin(broadcast(perSource.agg(
        sum(col("tokens")).as("total"), sum(col("w")).as("sum_w"))))
      // reduce-before-multiply (q_temperature_mix's overflow-safe form):
      // total·w would pass 2^63 at 100 TB; this is the same integer
      .select(col("source"),
        expr("w * (total div sum_w) + (w * (total % sum_w)) div sum_w")
          .as("target_tokens"))
    // two-level running token total in (skey, doc_id) order per source
    val w1 = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("skey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = toks.withColumn("cum_in", sum(col("n_toks")).over(w1))
    val w2 = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = toks.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_toks")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(w2), lit(0L)))
      .select(col("source"), col("bucket"), col("boff"))
    within.join(broadcast(boff), Seq("source", "bucket"))
      .withColumn("cum_toks", col("cum_in") + col("boff"))
      .join(broadcast(targets), Seq("source"))
      // selected iff the doc's stream START offset lies inside the budget
      .filter(col("cum_toks") - col("n_toks") < col("target_tokens"))
      .select(col("source"), col("doc_id"), col("n_toks"), col("cum_toks"))
  }

  private val qEpochSampleSql =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    len(string_split(trim(text), ' '))::BIGINT AS n_toks,
       |    $skeySql AS skey
       |  FROM documents),
       |per AS (
       |  SELECT source, CAST(SUM(n_toks) AS BIGINT) AS tokens,
       |    CAST(floor(sqrt(CAST(SUM(n_toks) AS BIGINT))) AS BIGINT) AS w
       |  FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
       |               CAST(SUM(w) AS BIGINT) AS sum_w FROM per),
       |tgt AS (SELECT source,
       |  w * (total // sum_w) + (w * (total % sum_w)) // sum_w AS target_tokens
       |  FROM per, tot),
       |cum AS (
       |  SELECT doc_id, source, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY source ORDER BY skey, doc_id
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_toks
       |  FROM toks)
       |SELECT cum.source, doc_id, n_toks, cum_toks
       |FROM cum JOIN tgt ON cum.source = tgt.source
       |WHERE cum_toks - n_toks < target_tokens""".stripMargin

  // --- q_shuffle_windows: WINDOW-level shuffle (pack ∘ shuffle) ----------
  // What the training loader actually permutes is sequences, not
  // documents: the pack windows (q_pack_windows) get the epoch
  // permutation. The window key mixes (portable source-string hash,
  // win_id) through the same multiplicative hash — the string fold is
  // the suite's polynomial (acc·31 + ascii) mod-P convention, per
  // window row over short source names, codegen'd HOF, no global
  // window anywhere; shard and position derive exactly as in
  // q_shuffle_shards (two-level key-range rank). The oracle nests the
  // pack-windows oracle as a derived table, so the pack→shuffle
  // composition is hash-gated end to end.
  private val HashP = graft.functions.PolyMinHash.P

  private def srcHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast(LongType)),
      lit(0L),
      (acc, ch) => (acc * 31 + ch) % HashP)

  private def qShuffleWindows(spark: SparkSession, dir: String): DataFrame = {
    val keyed = PackingOps.windowsOver(table(spark, dir, "documents"))
      .withColumn("srch", srcHash(col("source")))
      .withColumn("skey", expr(
        s"(((srch + win_id) % 2147483648L) * 2654435761L" +
          s" + ${Seed}L * 40503L) % ${KeySpace}L"))
      .withColumn("shard", expr(s"skey % ${NumShards}L"))
      .withColumn("bucket", expr(s"skey div ${BucketWidth}L"))
    val w1 = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("skey"), col("source"), col("win_id"))
    val within = keyed.withColumn("rn_in", row_number().over(w1).cast(LongType))
    val w2 = Window.partitionBy(col("shard")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = keyed.groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(w2), lit(0L)))
      .select(col("shard"), col("bucket"), col("boff"))
    within.join(broadcast(boff), Seq("shard", "bucket"))
      .select(col("source"), col("win_id"), col("n_tokens"),
        col("shard"), (col("rn_in") + col("boff")).as("pos"))
  }

  private val qShuffleWindowsSql =
    s"""WITH w AS (SELECT * FROM (${PackingOps.qPackWindowsOracle})),
       |k AS (
       |  SELECT source, win_id, n_tokens,
       |    (((list_reduce(list_prepend(0::BIGINT,
       |        [ascii(substring(source, i, 1))::BIGINT
       |         FOR i IN range(1, length(source)+1)]),
       |        (acc, c) -> (acc*31 + c) % $HashP) + win_id) % 2147483648)
       |      * 2654435761 + $Seed * 40503) % $KeySpace AS skey
       |  FROM w)
       |SELECT source, win_id, n_tokens, skey % $NumShards AS shard,
       |  ROW_NUMBER() OVER (PARTITION BY skey % $NumShards
       |    ORDER BY skey, source, win_id) AS pos
       |FROM k""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_shuffle_shards", qShuffleShards, Some(qShuffleShardsSql)),
    QueryDef("q_epoch_sample", qEpochSample, Some(qEpochSampleSql)),
    QueryDef("q_shuffle_windows", qShuffleWindows, Some(qShuffleWindowsSql)))
}
