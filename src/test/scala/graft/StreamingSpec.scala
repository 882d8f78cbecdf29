package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming ops cross-checked against their batch analogues on
  * the same bounded input (sf0.001 events).
  *
  * The input is split into THREE time-ordered files consumed with
  * `maxFilesPerTrigger = 1`, so every test runs a genuine multi-micro-batch
  * stream: watermark advancement, cross-batch state carry-over, and the
  * update-mode re-emission of changed keys are all exercised (a single-file
  * run would collapse to one batch and test none of that). Results go
  * through `runToMemory(latestBy = ...)` because in update mode superseded
  * rows from earlier batches must be dropped per key, in batch order. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  // Three contiguous event-time bands as separate files with increasing
  // mtimes: the file source (latestFirst=false) then triggers them oldest
  // first, giving in-event-time-order arrival across micro-batches — the
  // ordering contract under which sessionize matches batch q24 exactly.
  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rk", row_number().over(Window.orderBy(col("ts"), col("event_id"))))
    val n = df.count()
    for (b <- 0 until 3) {
      val lo = b * n / 3 + 1
      val hi = (b + 1) * n / 3
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-band$b")
      df.filter(col("rk") >= lo && col("rk") <= hi).drop("rk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part = // Files.list holds an open directory handle until closed
        try listing.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst.get
        finally listing.close()
      val dst = dir.resolve(f"band$b%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    dir.toString
  }

  test("watermarked windowed counts equal the batch computation across micro-batches") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.windowedCounts(
        EventStream.readEvents(spark, path, maxFilesPerTrigger = 1)),
      "win_counts", outputMode = "update",
      latestBy = Seq("window", "event_type"))
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

  test("stateful sessionization matches the batch gap logic (q24) across micro-batches") {
    val updates = EventStream.runToMemory(spark,
      EventStream.sessionize(spark,
        EventStream.readEvents(spark, path, maxFilesPerTrigger = 1)).toDF(),
      "sessions", outputMode = "update", latestBy = Seq("user_id"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap // final state per user

    val batch = SparkEntry.queries("q24_sessionize")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap // user -> n_sessions

    // bidirectional: every batch user matches AND the stream emits no
    // phantom keys (a spurious zero-event emission would pass a subset
    // check and the total-events sum unchanged)
    assert(updates.keySet === batch.keySet)
    batch.foreach { case (user, nSessions) =>
      assert(updates(user)._1 === nSessions, s"user $user")
    }
    // total events accounted for
    val totalEvents = spark.read.parquet(path).count()
    assert(updates.values.map(_._2).sum === totalEvents)
  }
}
