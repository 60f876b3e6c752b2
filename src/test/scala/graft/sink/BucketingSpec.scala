package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.SkewJoin

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "ov")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "iv")
    Bucketing.writeBucketed(orders, "b_orders", "key", 4)
    Bucketing.writeBucketed(items, "b_items", "key", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "b_orders")
        .join(Bucketing.readTable(spark, "b_items"), "key")
      assert(!Bucketing.hasShuffle(joined), "bucketed join must be shuffle-free")
      assert(joined.count() === 3000)
      // same join on raw (unbucketed) frames does shuffle
      val raw = orders.join(items, "key")
      assert(Bucketing.hasShuffle(raw))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned events prune partitions on range filters") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-03 10:00:00"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    PartitionedLayout.writeEventsByDay(events, dir)
    val filtered = PartitionedLayout.readEvents(spark, dir)
      .filter(col("event_date") === "2024-01-02")
    assert(PartitionedLayout.prunesPartitions(filtered))
    assert(filtered.count() === 1)
    assert(filtered.collect().head.getAs[Long]("event_id") === 2L)
  }

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val large = ((1L to 900L).map(_ => 7L) ++ (1L to 100L).map(i => i % 10 + 100L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (Seq(7L) ++ (100L to 109L)).map(k => (k, s"d$k")).toDF("key", "dv")
    val salted = SkewJoin.saltedJoin(large, dim, "key", salts = 8)
      .select("key", "payload", "dv")
    val plain = large.join(dim, "key").select("key", "payload", "dv")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
