package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Tombstone deletion on the persisted IVF store: immediate read-path
  * exclusion, shadowing of re-appends until compaction, compaction
  * durability (tombstones retired), and retrain-from-the-store
  * excluding deleted vectors. */
class IvfDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cents: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(1.0, 0.0, 0.0, 0.0),
    1L -> Seq(0.0, 1.0, 0.0, 0.0))

  private def vdf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private val a = (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
  private val b = (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f))
  private val c = (3L, Seq(0.95f, 0.05f, 0.0f, 0.0f))
  private val d = (30L, Seq(0.8f, 0.2f, 0.0f, 0.0f))

  private def neighborsOf(indexDir: String, q: Long): Set[Long] =
    IvfIndex.topKIndexed(spark, indexDir, nprobe = 2)
      .filter(col("query_id") === q)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet

  private def epochCount(indexDir: String): Int =
    new java.io.File(s"$indexDir/cells.parquet").listFiles()
      .map(_.getName).count(_.startsWith("epoch="))

  test("delete hides immediately, shadows re-appends, compaction retires it") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString + "/idx"
    IvfIndex.buildIndex(spark, idx, cents, vdf(a, b, c, d))
    assert(neighborsOf(idx, 1L) === Set(2L, 3L, 30L))

    // O(ids) tombstone: gone from the serve path without any rewrite
    IvfIndex.deleteFromIndex(spark, idx, Seq(2L).toDF("vec_id"))
    assert(neighborsOf(idx, 1L) === Set(3L, 30L))
    // and from the cell-member read the streaming lanes use
    val members = IvfIndex.cellMembers(spark, idx, Seq(0L))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(!members.contains(2L))

    // a re-append inside the tombstone's lifetime stays dead
    IvfIndex.appendToIndex(spark, idx, vdf(b))
    assert(neighborsOf(idx, 1L) === Set(3L, 30L))

    // compaction folds the tombstoned rows out and RETIRES the tombstones
    IvfIndex.compact(spark, idx)
    assert(epochCount(idx) === 1)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists(),
      "compaction must retire the tombstone table")
    assert(neighborsOf(idx, 1L) === Set(3L, 30L))

    // after the deletion is durable, a fresh append is a normal insert
    IvfIndex.appendToIndex(spark, idx, vdf(b))
    assert(neighborsOf(idx, 1L) === Set(2L, 3L, 30L))
  }

  test("AnnIndex (LSH store): delete excludes, compact retires, re-append revives") {
    val idx = java.nio.file.Files.createTempDirectory("graft-anndel").toString + "/idx"
    val emb = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    AnnIndex.buildIndex(spark, emb, idx)
    val before = AnnIndex.topKIndexed(spark, idx)
      .select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val victim = before.head
    AnnIndex.deleteFromIndex(spark, idx, Seq(victim).toDF("vec_id"))
    def neighbors() = AnnIndex.topKIndexed(spark, idx)
      .select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!neighbors().contains(victim))
    AnnIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    assert(!neighbors().contains(victim))
    AnnIndex.appendToIndex(spark, idx, emb.filter(col("vec_id") === victim))
    assert(neighbors().contains(victim), "post-compact re-append is a normal insert")
  }

  test("PqIndex (code store): delete excludes, forced one-epoch compact retires") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pqdel").toString + "/idx"
    val emb = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    PqIndex.buildIndex(spark, emb, idx)
    val queries = emb.filter(col("vec_id") < 20)
    val before = PqIndex.topKIndexed(spark, queries, idx)
      .select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val victim = before.head
    PqIndex.deleteFromIndex(spark, idx, Seq(victim).toDF("vec_id"))
    def neighbors() = PqIndex.topKIndexed(spark, queries, idx)
      .select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!neighbors().contains(victim))
    // one-epoch store + pending tombstones: the fold must still run
    PqIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    assert(!neighbors().contains(victim))
    val resident = PqIndex.residentVecIds(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(!resident.contains(victim), "ledger must drop the id at compact")
  }

  test("retrain rebuilds from the resident set minus tombstones") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfdelrt").toString + "/idx"
    IvfIndex.buildIndex(spark, idx, cents, vdf(a, b, c, d))
    IvfIndex.deleteFromIndex(spark, idx, Seq(3L).toDF("vec_id"))
    IvfIndex.retrain(spark, idx)
    // the rebuilt store never contained the deleted vector, and the
    // whole-dir swap dropped the tombstone table with the old store
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists())
    val resident = spark.read.parquet(s"$idx/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(resident === Set(1L, 2L, 30L))
  }
}
