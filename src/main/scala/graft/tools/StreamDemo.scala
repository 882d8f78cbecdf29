package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStream

/** Streaming demo CLI: runs the watermarked windowed aggregation and the
  * stateful sessionizer over an events parquet directory (bounded input,
  * memory sink) and prints the results.
  * Usage: runMain graft.tools.StreamDemo [eventsDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.withMaster(SparkSession.builder(), "local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val created = args.isEmpty
    val dir = args.headOption.getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft-stream-demo")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        d.resolve("events.parquet"))
      d.toString
    }

    val wc = EventStream.runToMemory(spark,
      EventStream.windowedCounts(EventStream.readEvents(spark, dir)), "demo_wc")
    println(s"[stream-demo] windowed rows=${wc.count()}")
    wc.orderBy("window").show(5, truncate = false)

    val sess = EventStream.runToMemory(spark,
      EventStream.sessionize(spark, EventStream.readEvents(spark, dir)).toDF(),
      "demo_sess")
    println(s"[stream-demo] session updates=${sess.count()}")
    sess.orderBy("user_id").show(5, truncate = false)
    spark.stop()
    if (created) BenchHarness.deleteDir(dir) // only the dir this run made
    println("[stream-demo] OK")
  }
}
