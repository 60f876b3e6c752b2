package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ShardedExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = (0L until 100L).map(i => (i, s"doc body $i", s"src${i % 3}"))
    .toDF("doc_id", "text", "source")

  test("export writes all rows, manifest accounts for every shard") {
    val dir = Files.createTempDirectory("graft-export").resolve("e").toString
    val m = ShardedExport.export(spark, fixture, dir, 4, "doc_id")
    assert(m.totalRows === 100L)
    assert(m.shards.map(_.rows).sum === 100L)
    assert(m.shards.map(_.shard).toSet.subsetOf((0 until 4).toSet))
    // every line is valid JSON carrying the original columns
    val back = ShardedExport.readBack(spark, dir)
      .select(from_json(col("value"),
        fixture.schema).as("r"))
      .select(col("r.doc_id"), col("r.text"), col("r.source"))
    assert(back.count() === 100L)
    assert(back.except(fixture).isEmpty && fixture.except(back).isEmpty,
      "re-read export must equal the source")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest.json")))
    assert(manifest.contains("\"total_rows\":100"))
  }

  test("manifest lists EVERY requested shard, empty ones included") {
    val dir = Files.createTempDirectory("graft-export").resolve("e").toString
    // 10 rows into 64 shards: most shards receive nothing
    val m = ShardedExport.export(spark, fixture.limit(10), dir, 64, "doc_id")
    assert(m.shards.map(_.shard) === (0 until 64),
      "manifest must carry all 64 shard entries in order")
    assert(m.shards.map(_.rows).sum === 10L)
    val empty = m.shards.filter(_.rows == 0L)
    assert(empty.nonEmpty && empty.forall(_.contentHash == 0L),
      "legitimately-empty shards must render rows=0, content_hash=0")
    assert(m.render.contains("\"num_shards\":64"))
  }

  test("content hash is multiplicity-sensitive (an XOR digest is not)") {
    val once = Seq((1L, "same body")).toDF("doc_id", "text")
    val thrice = Seq((1L, "same body"), (1L, "same body"), (1L, "same body"))
      .toDF("doc_id", "text")
    val d1 = Files.createTempDirectory("graft-export").resolve("x1").toString
    val d3 = Files.createTempDirectory("graft-export").resolve("x3").toString
    val m1 = ShardedExport.export(spark, once, d1, 1, "doc_id")
    val m3 = ShardedExport.export(spark, thrice, d3, 1, "doc_id")
    // h vs h^h^h are equal under XOR; the summed digest must differ
    assert(m1.shards.head.contentHash !== m3.shards.head.contentHash,
      "3 copies of a line must not hash like 1 copy")
  }

  test("export is deterministic: identical manifest on re-run") {
    val d1 = Files.createTempDirectory("graft-export").resolve("a").toString
    val d2 = Files.createTempDirectory("graft-export").resolve("b").toString
    val m1 = ShardedExport.export(spark, fixture, d1, 8, "doc_id")
    val m2 = ShardedExport.export(spark, fixture, d2, 8, "doc_id")
    assert(m1.render === m2.render)
  }

  test("shard routing follows pmod(xxhash64(key), n)") {
    val dir = Files.createTempDirectory("graft-export").resolve("e").toString
    ShardedExport.export(spark, fixture, dir, 4, "doc_id")
    val expected = fixture
      .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(4L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = ShardedExport.readBack(spark, dir)
      .withColumn("shard",
        regexp_extract(input_file_name(), "__shard=(\\d+)", 1).cast("long"))
      .select(get_json_object(col("value"), "$.doc_id").cast("long").as("doc_id"),
        col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual === expected)
  }
}
