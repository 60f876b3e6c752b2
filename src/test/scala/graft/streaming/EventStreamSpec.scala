package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import EventStream._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, typ: String = "click", v: Double = 1.0) =
    Event(id, ts(t), user, typ, v, "{}")

  test("windowed hourly aggregation over a memory stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = hourlyAggregates(input.toDF())
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1),
        ev(2, "2024-01-01 10:55:00", 2, "view", 2.0),
        ev(3, "2024-01-01 11:05:00", 1))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT hour, event_type, n_events FROM hourly ORDER BY hour, event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq(
        (ts("2024-01-01 10:00:00"), "click", 1L),
        (ts("2024-01-01 10:00:00"), "view", 1L),
        (ts("2024-01-01 11:00:00"), "click", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions on gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val sessions = sessionize(spark, input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart, then a 2h gap, then one more —
      // the gap closes session 1 within the same user's batch processing
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1),
        ev(2, "2024-01-01 10:05:00", 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 12:30:00", 1))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_value FROM sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq === Seq(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2L, 3.0)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to recent views") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val joined = clickViewAttribution(input.toDF())
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 10:10:00", 1, "click"), // within 30m of view 1
        ev(3, "2024-01-01 11:30:00", 1, "click"), // no view within 30m
        ev(4, "2024-01-01 10:05:00", 2, "view"))  // other user
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((2L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val deduped = dedupStream(input.toDF())
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1),
        ev(1, "2024-01-01 10:00:30", 1), // duplicate id, later ts
        ev(2, "2024-01-01 10:01:00", 2))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:02:00", 1)) // dup again, later batch
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup ORDER BY event_id")
        .collect().map(_.getLong(0))
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("watermark drops state for closed windows (append mode emits finalized windows)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = hourlyAggregates(input.toDF())
    val q = agg.writeStream.format("memory").queryName("hourly_append")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, "2024-01-01 10:05:00", 1))
      q.processAllAvailable()
      // advance watermark past 10:00-11:00 + 2h
      input.addData(ev(2, "2024-01-01 13:30:00", 1))
      q.processAllAvailable()
      val finalized = spark.sql("SELECT hour, n_events FROM hourly_append").collect()
      assert(finalized.map(r => r.getTimestamp(0)).toSeq === Seq(ts("2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("foreachBatch sink delivers micro-batches to a table writer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // the (df, batchId) consumer stands in for PostgresSink.write — the
    // wiring under test is batch delivery + checkpointed batch ids
    val q = writeBatches(input.toDF(), ckpt,
      (df, id) => delivered.add(id -> df.count())).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 2))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:02:00", 3))
      q.processAllAvailable()
      val batches = delivered.toArray(Array.empty[(Long, Long)]).toSeq
      assert(batches.map(_._2).sum === 3L)
      assert(batches.map(_._1) === batches.map(_._1).sorted)
    } finally q.stop()
  }
}
