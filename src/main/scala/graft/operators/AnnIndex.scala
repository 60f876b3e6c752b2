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
  * Appending the same batch twice duplicates its band AND vector rows;
  * query output stays identical because [[topKIndexed]] dedups both the
  * candidate set and the rescored (query, neighbor) pairs — but index
  * size and epoch count grow, so idempotent re-runs still dedupe at the
  * vec_id level before calling, exactly the IncrementalDedup
  * .appendToIndex contract. (The rescore dedup is also what makes the
  * compaction publish window — old epochs and the consolidated epoch
  * briefly coexisting — invisible to queries.)
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
      AtomicPublish.stageAndRename(
        spark, new Path(root, tab).toString, s".epoch-$epoch.tmp", s"epoch=$epoch") {
        tmp => df.write.mode("overwrite").parquet(tmp.toString)
      }
    }
  }

  /** Build (overwrite) the index as epoch 0. */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, indexDir: String): Unit =
    StoreLock.withLock(spark, indexDir, "ann-build") {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    writeEpoch(spark, indexDir, 0, embeddings)
  }

  /** Fold a batch of new vectors into the live index: O(batch) work, one
    * atomic directory rename per table. Single-writer (epoch numbering is
    * read-modify-write); queries may run concurrently. */
  def appendToIndex(spark: SparkSession, indexDir: String, batch: DataFrame): Unit =
    StoreLock.withLock(spark, indexDir, "ann-append") {
    val bands = new Path(indexDir, "bands.parquet")
    val fs = bands.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = fs.listStatus(bands).map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toInt).max + 1
    writeEpoch(spark, indexDir, next, batch)
  }

  /** Compact every published epoch into ONE fresh epoch — the lifecycle
    * counterpart of [[appendToIndex]]: streaming maintenance accumulates
    * one epoch directory per micro-batch, and a long-running index pays
    * ever-growing listing/open cost per query. Publish-before-delete:
    *  1. write the DEDUPLICATED union of all live epochs to a dot-prefixed
    *     staging dir (invisible);
    *  2. rename staging to a FRESH `epoch=max+1` (single atomic publish);
    *  3. delete the old epochs.
    * At no point is consolidated data the only copy while old epochs are
    * hidden — the previous scheme (hide olds, then publish) lost the
    * hidden `.old-epoch=*` data if a crash landed between hide and
    * publish and compact was re-run (the re-run deleted `.compact.tmp`,
    * the only consolidated copy, and rebuilt from the visible subset).
    * Crash windows now: before (2) only invisible staging exists and a
    * re-run starts clean; between (2) and (3) readers see old epochs AND
    * the consolidated epoch — duplicate rows, which [[topKIndexed]]'s
    * rescore dedup makes invisible to query output — and a re-run
    * converges because the union is deduplicated before writing. Query
    * output is identical before, during, and after (band/vector rows are
    * a set; the epoch column never reaches query semantics).
    * Single-writer like append; readers never need a quiescent window. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StoreLock.withLock(spark, indexDir, "ann-compact") {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // frozen tombstone epoch set: fold out exactly these, retire exactly
    // these — a takedown racing this compact stays pending for the next
    val ts = Tombstones.snapshot(spark, indexDir)
    for (tab <- Seq("bands.parquet", "vectors.parquet")) {
      val dir = new Path(root, tab)
      val live = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
      val next = live.map(_.getName.stripPrefix("epoch=").toInt).max + 1
      // one consolidated write — partition count is Spark's choice, the
      // win is one directory and full-size files instead of per-batch
      // dirs. dropDuplicates: epochs are a row set; dedup here both
      // absorbs double-appended batches and makes a crash-rerun (which
      // unions olds + the already-published consolidated epoch) converge.
      // Tombstoned vectors fold out here (the family deletion contract).
      AtomicPublish.publishThenDelete(
        spark, dir.toString, ".compact.tmp", s"epoch=$next", live.toSeq) { tmp =>
        ts.minus(spark,
            spark.read.parquet(live.map(_.toString): _*).dropDuplicates(), "vec_id")
          .write.mode("overwrite").parquet(tmp.toString)
      }
    }
    // deletions durable in both folded tables — retire the SNAPSHOT's
    // epochs only; a takedown that raced this compact stays pending
    ts.clear(spark)
  }

  /** Tombstone a set of (vec_id) rows — O(ids); [[topKIndexed]] excludes
    * them immediately, [[compact]] makes the deletion durable
    * ([[Tombstones]] family contract). */
  def deleteFromIndex(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    Tombstones.delete(spark, indexDir, ids, "vec_id")

  /** Top-k per query over the persisted index. Queries are index members
    * (`vec_id < NumQueries`, the suite's fixed probe set); their band keys
    * and 1-bit multiprobe expansion are computed map-only from the rescore
    * store, so the WHOLE plan reads index files only — the embeddings
    * table is structurally absent (spec-pinned). */
  def topKIndexed(spark: SparkSession, indexDir: String): DataFrame = {
    val bands = Tombstones.minus(spark, indexDir,
      spark.read.parquet(s"$indexDir/bands.parquet")
        .select(col("vec_id"), col("band"), col("bkey")), "vec_id")
    val vectors = Tombstones.minus(spark, indexDir,
      spark.read.parquet(s"$indexDir/vectors.parquet")
        .select(col("vec_id"), col("v"), col("norm")), "vec_id")
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
      // duplicate vector/query rows (double-appended batch, or the
      // compaction window where old epochs and the consolidated epoch
      // coexist) would otherwise emit the same neighbor at two ranks and
      // displace the true Kth. Dup rows are value-identical (same vec_id
      // → same v/norm), so keeping any one is exact; dedup is over the
      // candidate-sized set, not the corpus-sized rescore store.
      .dropDuplicates("query_id", "neighbor_id")
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
    val key = IndexStamp.dirKey(IndexStamp.identity(dir, "embeddings.parquet", "v1"))
    StoreRoot.dir(s"graft-ann-index-$key")
  }

  private def qAnnLshIndexed(spark: SparkSession, dir: String): DataFrame = {
    val indexDir = indexDirFor(dir)
    if (!StoreRoot.exists(spark, s"$indexDir/bands.parquet"))
      buildIndex(spark, Tables.table(spark, dir, "embeddings"), indexDir)
    topKIndexed(spark, indexDir)
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_ann_lsh_indexed", qAnnLshIndexed, Some(SimilarityOps.qAnnLshPortableSql)))
}
