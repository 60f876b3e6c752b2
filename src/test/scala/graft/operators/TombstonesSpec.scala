package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The shared deletion discipline's snapshot contract (round-11 advisory
  * close): a compact folds out and retires EXACTLY the tombstone epochs
  * frozen at its start — a takedown that races the compact (lands
  * between the fold-read and the clear) must survive as pending work,
  * not be silently destroyed with the table. */
class TombstonesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-tomb").toString + "/idx"

  test("a tombstone epoch written after a snapshot survives the snapshot's clear") {
    val dir = freshDir()
    Tombstones.delete(spark, dir, Seq(1L).toDF("k"), "k")
    // the compact freezes its epoch set here (before its fold-read)...
    val snap = Tombstones.snapshot(spark, dir)
    assert(snap.nonEmpty)
    // ...and a takedown races it, landing while the fold is in flight
    Tombstones.delete(spark, dir, Seq(2L).toDF("k"), "k")
    snap.clear(spark)
    // the frozen epoch retired; the racing one is still pending —
    // the old whole-table clear would have resurrected key 2
    assert(Tombstones.pending(spark, dir))
    val left = Tombstones.ids(spark, dir, "k").get
      .collect().map(_.getLong(0)).toSet
    assert(left === Set(2L))
    // the NEXT compact's snapshot retires it and the table goes away
    Tombstones.snapshot(spark, dir).clear(spark)
    assert(!Tombstones.pending(spark, dir))
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists())
  }

  test("snapshot reads exactly the frozen epoch set; live reads see everything") {
    val dir = freshDir()
    Tombstones.delete(spark, dir, Seq(1L).toDF("k"), "k")
    val snap = Tombstones.snapshot(spark, dir)
    Tombstones.delete(spark, dir, Seq(2L).toDF("k"), "k")
    val df = Seq(1L, 2L, 3L).toDF("k")
    // the compact's fold removes only the frozen set...
    assert(snap.minus(spark, df, "k").collect().map(_.getLong(0)).toSet
      === Set(2L, 3L))
    // ...while serve paths (live minus) already hide the racing delete too
    assert(Tombstones.minus(spark, dir, df, "k")
      .collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("an empty snapshot is a no-op clear and folds nothing") {
    val dir = freshDir()
    val snap = Tombstones.snapshot(spark, dir)
    assert(!snap.nonEmpty)
    val df = Seq(1L).toDF("k")
    assert(snap.minus(spark, df, "k").count() === 1L)
    snap.clear(spark) // must not throw on the absent table
    assert(!Tombstones.pending(spark, dir))
  }
}
