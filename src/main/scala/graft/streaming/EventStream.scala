package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` schema — the streaming
  * expression of graft.operators.EventOps. The reference has no data-plane
  * streaming (SURVEY §2.10); this is part of the extended 100-TB surface:
  * `readStream` → watermarked windowed aggs / stateful sessionization →
  * `writeStream`.
  *
  * Scale design: windowed aggregation state is bounded by the watermark
  * (late events beyond 2h are dropped, state for closed windows evicted);
  * sessionization state is one small struct per active user, evicted by
  * event-time timeout. Both shard by the grouping key across executors.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream source over an events directory (parquet/json). */
  def readEventStream(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Tumbling 1h window × event_type counts/sums, 2h watermark. */
  def hourlyAggregates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"), col("approx_users"))

  // --- stateful sessionization ------------------------------------------
  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionState(
      sessionStart: Long, lastSeen: Long, nEvents: Long, sumValue: Double)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** flatMapGroupsWithState sessionizer: maintains one open session per
    * user; emits a session when the 30-min gap elapses (event-time
    * timeout) or a later event implies the gap passed. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastSeen), s.nEvents, s.sumValue))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > SessionGapMs =>
                  closed += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastSeen), s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + SessionGapMs)
            }
            closed.iterator
          }
      }
  }

  /** Stream-stream interval join: attribute each click to view events by
    * the same user within the preceding 30 minutes. Both sides carry
    * watermarks so join state is evicted once the interval can no longer
    * match — the bounded-state form of streaming attribution.
    */
  def clickViewAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    clicks.join(views,
      expr("""c_user = v_user AND
             |view_ts <= click_ts AND
             |view_ts >= click_ts - INTERVAL 30 MINUTES""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Streaming exact dedup on event_id: state bounded by the watermark
    * (duplicates arriving later than 1h are considered impossible/ignored
    * by contract — at 100 TB/day the watermark is what keeps dedup state
    * finite). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Convenience writer: stream → parquet sink with checkpointing. */
  def writeParquet(df: DataFrame, outDir: String, checkpointDir: String) =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())

  /** Stream → table sink via foreachBatch: each micro-batch lands through
    * the batch writer (PostgresSink.write when a PG sink is configured —
    * COPY-speed per batch — or any (DataFrame, batchId) consumer). Append
    * semantics; exactly-once derives from the checkpointed batchId, which
    * the consumer can record for idempotent re-delivery. */
  def writeBatches(
      df: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit) =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch(sink)
}
