package graft.operators

import org.apache.hadoop.fs.Path
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN over a PERSISTED LSH index — the production shape the inline lanes
  * (`q_ann_lsh`, `q_ann_lsh_portable`) document but don't materialize: at
  * 100 TB the banded index is built ONCE, maintained by appends as the
  * corpus grows, and every query touches only the index tables — never the
  * raw embeddings. The ANN twin of [[IncrementalDedup]]'s persisted
  * shingle index (reference analogue: the idempotent re-run semantics of
  * main.py:153-168 — already-indexed data is never re-processed).
  *
  * Index layout under `indexDir` (epoch-partitioned, single-writer):
  *  - `bands.parquet/epoch=K/`:   (vec_id, band, bkey) — AxisBands rows
  *                                per vector; 8-byte keys, no vectors
  *  - `vectors.parquet/epoch=K/`: (vec_id, v, norm) — the rescore store
  *                                (in a real deployment this is the
  *                                columnar table itself; norms precomputed)
  *
  * Band rows are purely ADDITIVE — appending a batch cannot change any
  * existing row (unlike the dedup index, whose df-caps force a merge +
  * rewrite). So an append is O(batch), not O(index): the batch's rows are
  * written to a fresh `epoch=K` directory beside the live index (under a
  * `.tmp` staging name) and a SINGLE directory rename publishes them —
  * readers either see the whole epoch or none of it, and a crashed append
  * leaves only an invisible staging dir that the next append overwrites.
  * Appending the same batch twice duplicates its band rows (candidate
  * dedup makes the QUERY result identical, but index size and epoch count
  * grow) — idempotent re-runs dedupe at the vec_id level before calling,
  * exactly the IncrementalDedup.appendToIndex contract.
  *
  * Geometry is the portable axis-sign banding of `q_ann_lsh_portable`
  * (same bands, bits, 1-bit query-side multiprobe, exact cosine rescore,
  * same tie-breaks), so the indexed lane's output is row-identical to the
  * inline portable lane and rides the SAME DuckDB oracle — the whole
  * persisted-index path is rows+schema+hash gate-checked. The native
  * hyperplane geometry would index identically (swap the key expression);
  * portable is chosen so the gate covers the lane.
  */
object AnnIndex {
  import SimilarityOps.{AxisBands, AxisBits, axisBandKey, withNorm, K, NumQueries}

  private def bandRows(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(array((0 until AxisBands).map(b =>
        struct(lit(b).as("band"), axisBandKey(col("v"), b).as("bkey"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

  private def writeEpoch(
      spark: SparkSession, indexDir: String, epoch: Int, emb: DataFrame): Unit = {
    val e = withNorm(emb).select(col("vec_id"), col("v"), col("norm"))
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for ((tab, df) <- Seq(
        "bands.parquet" -> bandRows(e),
        "vectors.parquet" -> e)) {
      val live = new Path(root, s"$tab/epoch=$epoch")
      val tmp = new Path(root, s"$tab/.epoch-$epoch.tmp")
      fs.delete(tmp, true)
      df.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(live, true)
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"ANN index epoch publish failed: $tmp -> $live")
    }
  }

  /** Build (overwrite) the index as epoch 0. */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, indexDir: String): Unit = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    writeEpoch(spark, indexDir, 0, embeddings)
  }

  /** Fold a batch of new vectors into the live index: O(batch) work, one
    * atomic directory rename per table. Single-writer (epoch numbering is
    * read-modify-write); queries may run concurrently. */
  def appendToIndex(spark: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    val bands = new Path(indexDir, "bands.parquet")
    val fs = bands.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = fs.listStatus(bands).map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toInt).max + 1
    writeEpoch(spark, indexDir, next, batch)
  }

  /** Compact every published epoch into a single `epoch=0` — the
    * lifecycle counterpart of [[appendToIndex]]: streaming maintenance
    * accumulates one epoch directory per micro-batch, and a long-running
    * index pays ever-growing listing/open cost per query. Compaction
    * rewrites each table's union as ONE staged epoch and republishes:
    *  1. write the union to a dot-prefixed staging dir (invisible);
    *  2. hide the old epochs by renaming them dot-prefixed;
    *  3. rename the staging dir to `epoch=0`;
    *  4. delete the hidden olds.
    * Query output is identical before and after (band/vector rows are a
    * set; the epoch column never reaches query semantics). Crash windows,
    * honestly stated for a manifest-less directory layout: before (2) a
    * crash leaves only invisible staging (the existing crashed-append
    * contract); between (2) and (3) readers see a subset of epochs
    * (degraded recall, no corruption) and re-running `compact` completes
    * the publish; single-writer like append, and a quiescent window is
    * required only for exactly-complete results during the swap itself. */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (tab <- Seq("bands.parquet", "vectors.parquet")) {
      val dir = new Path(root, tab)
      val live = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
      val staging = new Path(dir, ".compact.tmp")
      fs.delete(staging, true)
      // one consolidated write — partition count is Spark's choice, the
      // win is one directory and full-size files instead of per-batch dirs
      spark.read.parquet(live.map(_.toString): _*)
        .write.mode("overwrite").parquet(staging.toString)
      val hidden = live.map(p => p -> new Path(dir, s".old-${p.getName}"))
      hidden.foreach { case (from, to) => fs.delete(to, true); fs.rename(from, to) }
      if (!fs.rename(staging, new Path(dir, "epoch=0")))
        throw new java.io.IOException(s"ANN index compaction publish failed: $tab")
      hidden.foreach { case (_, to) => fs.delete(to, true) }
    }
  }

  /** Top-k per query over the persisted index. Queries are index members
    * (`vec_id < NumQueries`, the suite's fixed probe set); their band keys
    * and 1-bit multiprobe expansion are computed map-only from the rescore
    * store, so the WHOLE plan reads index files only — the embeddings
    * table is structurally absent (spec-pinned). */
  def topKIndexed(spark: SparkSession, indexDir: String): DataFrame = {
    val bands = spark.read.parquet(s"$indexDir/bands.parquet")
      .select(col("vec_id"), col("band"), col("bkey"))
    val vectors = spark.read.parquet(s"$indexDir/vectors.parquet")
      .select(col("vec_id"), col("v"), col("norm"))
    val q = vectors.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val qBands = q.select(col("query_id"), explode(array((0 until AxisBands).map(b =>
        struct(lit(b).as("band"), axisBandKey(col("qv"), b).as("bkey"))): _*)).as("bb"))
      .select(col("query_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .select(col("query_id"), col("band"),
        explode(array((col("bkey") +: (0 until AxisBits).map(j =>
          col("bkey").bitwiseXOR(lit(1L << j)))): _*)).as("bkey"))
    val cand = bands.join(broadcast(qBands), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val dotp = graft.functions.VectorOps.dot(col("qv"), col("v"))
    val scored = cand
      .join(vectors, "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotp / (col("qnorm") * col("norm"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= K)
  }

  // --- q_ann_lsh_indexed: the persisted-index lane on the oracle gate ----
  // Index built on first use, keyed by the embeddings parquet's identity
  // (size + mtime) — repeat runs, the production cadence, pay only the
  // query phase. Output is row-identical to q_ann_lsh_portable (same
  // geometry, same rescore, same tie-breaks), so it shares that oracle.
  private def indexDirFor(dir: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/embeddings.parquet")
    val stamp =
      if (java.nio.file.Files.exists(src))
        s"${java.nio.file.Files.size(src)}-${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
      else "missing"
    val key = Integer.toHexString(s"$dir|$stamp|v1".hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft-ann-index-$key"
  }

  private def qAnnLshIndexed(spark: SparkSession, dir: String): DataFrame = {
    val indexDir = indexDirFor(dir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$indexDir/bands.parquet")))
      buildIndex(spark, Tables.table(spark, dir, "embeddings"), indexDir)
    topKIndexed(spark, indexDir)
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_lsh_indexed", qAnnLshIndexed, Some(SimilarityOps.qAnnLshPortableSql)))
}
