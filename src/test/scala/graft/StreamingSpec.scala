package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming ops cross-checked against their batch analogues on
  * the same bounded input (sf0.001 events). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  // the streaming file source requires a DIRECTORY of files
  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("watermarked windowed counts equal the batch computation") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.windowedCounts(EventStream.readEvents(spark, path)),
      "win_counts", outputMode = "update")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap

    val batch = spark.read.parquet(path)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap

    assert(streamed === batch)
  }

  test("stateful sessionization matches the batch gap logic (q24)") {
    val updates = EventStream.runToMemory(spark,
      EventStream.sessionize(spark,
        EventStream.readEvents(spark, path)).toDF(),
      "sessions", outputMode = "update")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.last).toMap // final state per user

    val batch = SparkEntry.queries("q24_sessionize")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap // user -> n_sessions

    batch.foreach { case (user, nSessions) =>
      assert(updates(user)._2 === nSessions, s"user $user")
    }
    // total events accounted for
    val totalEvents = spark.read.parquet(path).count()
    assert(updates.values.map(_._3).sum === totalEvents)
  }
}
