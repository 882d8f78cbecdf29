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

  /** `maxFilesPerTrigger` caps files per micro-batch (0 = source default):
    * tests set 1 over a multi-file dir to force a genuine multi-batch run. */
  def readEvents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0): Dataset[Event] = {
    import spark.implicits._
    val rs = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE")
    val rs2 =
      if (maxFilesPerTrigger > 0)
        rs.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else rs
    rs2.parquet(path)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }

  /** Watermarked TUMBLING-window counts per event type (streaming analogue
    * of q25's per-type aggregation; window() with no slide interval builds
    * non-overlapping 5-minute buckets — an oracle expecting sliding
    * windows would fan each event into multiple rows and mismatch). */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))

  /** Stateful sessionization with flatMapGroupsWithState (streaming
    * analogue of q24: a >30min event-time gap opens a new session). Emits
    * one update row per user per micro-batch.
    *
    * Cross-check contract vs batch q24: identical when events arrive in
    * event-time order across micro-batches (in-batch disorder is sorted
    * out). A LATE event landing in an earlier session's window is counted
    * into the CURRENT session (streaming cannot retroactively re-bucket
    * without retraction support) but never rewinds the gap high-water
    * mark — so lateness can only under-count session splits relative to
    * the batch answer, never invent splits the batch ordering lacks. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          // EXACT event-time micros (Spark timestamps are µs-precision;
          // getTime*1000 would truncate sub-ms and misclassify a gap
          // sitting exactly on the 30-min boundary vs batch q24's
          // unix_micros), used for both the in-batch sort and the gap
          def us(e: Event): Long = {
            val i = e.ts.toInstant
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }
          val sorted = rows.toSeq.sortBy(e => (us(e), e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val u = us(e)
            val newSession = st.lastUs == Long.MinValue ||
              u - st.lastUs > 1800L * 1000000L
            // lastUs is a high-water mark, NOT the last-seen value: a late
            // cross-batch event (negative gap) must not rewind it, or the
            // next on-time event would measure its gap from the straggler
            // and open a session the batch q24 ordering never sees
            st = SessionState(st.sessions + (if (newSession) 1 else 0),
              st.events + 1, math.max(st.lastUs, u))
          }
          state.update(st)
          Iterator.single(SessionUpdate(userId, st.sessions, st.events))
        })
  }

  /** Run a streaming DataFrame to completion over the (bounded) file input;
    * returns the result table. In update mode the memory sink RETAINS
    * superseded rows from earlier micro-batches (an input split across
    * triggers — e.g. >maxFilesPerTrigger files — yields stale duplicates
    * per key, and collect() order says nothing about which is newest), so
    * callers wanting final-state-per-key MUST pass `latestBy`: the result
    * then keeps only each key's newest update, taken in guaranteed
    * micro-batch order via foreachBatch. The latestBy path collects each
    * batch's (keyed, update-mode-compact) output to the driver — this is a
    * bounded test/demo surface, not a production sink. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "update", latestBy: Seq[String] = Nil): DataFrame = {
    if (latestBy.isEmpty) {
      val q: StreamingQuery = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name)
    } else {
      val acc = new java.util.LinkedHashMap[Seq[Any], org.apache.spark.sql.Row]
      val q: StreamingQuery = df.writeStream
        .outputMode(outputMode)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val keyIdx = latestBy.map(b.schema.fieldIndex)
          // batches arrive in order; an update-mode agg emits each changed
          // key once per batch — put() keeps the newest. The collect() is
          // bounded by the CHANGED KEYS PER MICRO-BATCH (not the stream's
          // key universe); this demo/spec sink materializes the final
          // table on the driver by design — a production update-mode sink
          // would write per-batch deltas to a keyed store instead
          b.collect().foreach(r => acc.put(keyIdx.map(r.get), r))
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](acc.values())
      spark.createDataFrame(rows, df.schema)
    }
  }
}
