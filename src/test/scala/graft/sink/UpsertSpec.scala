package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class UpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("merge inserts new keys, updates matches, deletes tombstones") {
    val dir = Files.createTempDirectory("graft-upsert").resolve("t").toString
    Seq((1L, "a1"), (2L, "b1"), (3L, "c1")).toDF("id", "v").write.parquet(dir)
    val changes = Seq(
      (2L, "b2", false), // update
      (4L, "d1", false), // insert
      (3L, "dead", true) // delete
    ).toDF("id", "v", "is_deleted")
    val report = Upsert.merge(spark, dir, changes, "id", Some("is_deleted"))
    assert(report.before === 3 && report.changes === 3 && report.after === 3)
    val rows = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a1"), (2L, "b2"), (4L, "d1")))
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("merge-")),
      "swap must clean up its temp/backup directories")
  }

  test("merge without tombstone column is pure upsert") {
    val dir = Files.createTempDirectory("graft-upsert").resolve("t").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "n").write.parquet(dir)
    Upsert.merge(spark, dir, Seq((2L, 21L), (5L, 50L)).toDF("id", "n"), "id")
    val rows = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 10L), (2L, 21L), (5L, 50L)))
  }

  test("failed swap restores the original table") {
    // a changeset whose write fails must not corrupt the table: simulate
    // by merging a changeset with a column type clash that fails at write
    // plan time — the table must remain readable and unchanged
    val dir = Files.createTempDirectory("graft-upsert").resolve("t").toString
    Seq((1L, "x")).toDF("id", "v").write.parquet(dir)
    intercept[Exception] {
      Upsert.merge(spark, dir,
        Seq((2L, 99L)).toDF("id", "other_col"), "id")
    }
    val rows = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "x")))
  }
}
