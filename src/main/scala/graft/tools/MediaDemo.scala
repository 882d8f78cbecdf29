package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Multimodal

/** Multimodal plumbing demo: lifts a text table into binary media rows and
  * runs the (stubbed-codec) decode -> features -> resize -> frame-sample
  * pipeline. Usage: runMain graft.tools.MediaDemo [docsParquet] */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.001/documents.parquet")
    val spark = Sessions.withMaster(SparkSession.builder(), "local[4]")
      .appName("graft-media-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val media = Multimodal.fromText(
      spark.read.parquet(path).limit(200), "doc_id", "text")
      .as[Multimodal.MediaRow].cache()
    val feats = Multimodal.extractFeatures(spark, media)
    println(s"[media-demo] features rows=${feats.count()}")
    feats.toDF().show(3, truncate = false)

    val resized = Multimodal.resize(spark, media, targetW = 64)
    println(s"[media-demo] resized rows=${resized.count()}, " +
      s"avg bytes ${resized.map(_.media.length.toLong).reduce(_ + _) / resized.count()}")

    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 3)
    println(s"[media-demo] sampled frames=${frames.count()} from ${media.count()} inputs")
    spark.stop()
    println("[media-demo] OK")
  }
}
