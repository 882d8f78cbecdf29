package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface over the `events` table shape. The
  * reference is pure batch (SURVEY.md §2.10 — its pypeln queues are
  * pipelined batch parallelism), but a training-data engine needs the
  * streaming counterparts of its batch ops; these mirror q24/q25 so batch
  * and streaming results can be cross-checked on the same input.
  *
  * All queries run against a file source (`readStream.parquet` — note the
  * source takes a DIRECTORY), use event-time watermarks, and are driven
  * synchronously in tests via the memory sink + processAllAvailable. */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, sessions: Long, events: Long)

  /** Per-user running session state (event-time gap > 30 min = new one). */
  case class SessionState(sessions: Long, events: Long, lastUs: Long)

  def readEvents(spark: SparkSession, path: String): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(path)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }

  /** Watermarked sliding-window counts per event type (streaming analogue
    * of q25's per-type aggregation). */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))

  /** Stateful sessionization with flatMapGroupsWithState (streaming
    * analogue of q24: a >30min event-time gap opens a new session). Emits
    * one update row per user per micro-batch. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000L
            val newSession = st.lastUs == Long.MinValue ||
              us - st.lastUs > 1800L * 1000000L
            st = SessionState(st.sessions + (if (newSession) 1 else 0),
              st.events + 1, us)
          }
          state.update(st)
          Iterator.single(SessionUpdate(userId, st.sessions, st.events))
        })
  }

  /** Run a streaming DataFrame to completion over the (bounded) file input
    * via the memory sink; returns the final result table. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "update"): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
