package graft.sink

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus export — the hand-off surface between the
  * curation pipeline and a training job: rows are routed to a fixed number
  * of shards by a stable key hash (pmod(xxhash64(key), n)), written as
  * JSONL (one training example per line, the de-facto corpus interchange
  * format), and described by a manifest carrying per-shard row counts and
  * an order-independent content hash.
  *
  * Scale shape: ONE shuffle — the repartition on the shard id — then each
  * shard writes from its own partition; the manifest aggregation is
  * map-side combined down to `numShards` rows. Determinism contract: the
  * shard assignment is a pure function of the key (re-running the export
  * on the same data yields byte-identical manifests), and the content
  * hash is order-independent AND multiplicity-sensitive: the low 64 bits
  * of the SUM of per-row xxhash64 values (a bitwise-XOR digest is blind
  * to even multiplicities — losing exactly two copies of a duplicated
  * line keeps an XOR unchanged; a sum moves by 2·h). The manifest carries
  * ALL `numShards` entries, including legitimately-empty shards
  * (rows=0, content_hash=0) — a downstream loader can tell an empty
  * shard from a missing one.
  */
object ShardedExport {

  final case class ShardInfo(shard: Int, rows: Long, contentHash: Long)

  final case class Manifest(totalRows: Long, shards: Seq[ShardInfo]) {
    def render: String = {
      val body = shards.sortBy(_.shard).map(s =>
        s"""{"shard":${s.shard},"rows":${s.rows},"content_hash":${s.contentHash}}""")
        .mkString(",\n  ")
      s"""{"total_rows":$totalRows,"num_shards":${shards.size},"shards":[\n  $body\n]}"""
    }
  }

  /** Export `df` as `numShards` JSONL shard directories under `dir` plus
    * a `manifest.json`. `keyCol` drives shard routing (stable across
    * runs); every column is serialized via to_json of the full struct. */
  def export(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      numShards: Int,
      keyCol: String): Manifest = {
    require(numShards > 0, "numShards must be positive")
    val cols = df.columns
    val sharded = df
      .withColumn("__shard", pmod(xxhash64(col(keyCol)), lit(numShards.toLong)))
      .withColumn("__line", to_json(struct(cols.map(col): _*)))
    val routed = sharded.repartition(numShards, col("__shard")).cache()
    try {
      routed
        .select(col("__shard"), col("__line").as("value"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("__shard")
        .text(s"$dir/data")
      // decimal(30,0) headroom: |xxhash64| < 1e19, so the sum stays exact
      // up to ~1e11 rows per shard; the digest is its low 64 bits
      val populated = routed
        .groupBy(col("__shard"))
        .agg(count(lit(1)).as("rows"),
          expr("sum(cast(xxhash64(__line) as decimal(20,0)))").as("hsum"))
        .collect()
        .map(r => r.getLong(0).toInt ->
          ShardInfo(r.getLong(0).toInt, r.getLong(1),
            BigInt(r.getDecimal(2).toBigInteger).longValue))
        .toMap
      val infos = (0 until numShards).map(s =>
        populated.getOrElse(s, ShardInfo(s, 0L, 0L)))
      val manifest = Manifest(infos.map(_.rows).sum, infos)
      val p = new Path(s"$dir/manifest.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val outStream = fs.create(p, true)
      try outStream.write((manifest.render + "\n").getBytes(StandardCharsets.UTF_8))
      finally outStream.close()
      manifest
    } finally routed.unpersist()
  }

  /** Re-read an export's data (for verification / downstream loads). */
  def readBack(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(s"$dir/data")
}
