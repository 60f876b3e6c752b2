package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction merges small files, preserves content, swap leaves no temp dirs") {
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    // 40 tiny files
    (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val expected = before.orderBy("id").collect().toSeq
    val report = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(report.filesBefore === 40)
    assert(report.targetFiles === 1)
    assert(report.filesAfter === 1)
    val after = spark.read.parquet(dir)
    assert(after.orderBy("id").collect().toSeq === expected)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("compact-")),
      "swap must clean up its temp/backup directories")
  }

  test("sort-clustered compaction produces range-disjoint files") {
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    (1L to 9000L).map(i => (i % 997, i)).toDF("key", "payload")
      .repartition(30).write.parquet(dir)
    val report = Compaction.compact(spark, dir,
      targetBytes = 40L << 10, sortCols = Seq("key"))
    assert(report.filesAfter === report.targetFiles && report.filesAfter > 1)
    // each output file must cover a key range disjoint from the others —
    // that is what lets parquet footer stats prune file scans
    val ranges = spark.read.parquet(dir)
      .select(col("key"), input_file_name().as("f"))
      .groupBy(col("f")).agg(min("key").as("lo"), max("key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $ranges")
      case _ =>
    }
  }
}
