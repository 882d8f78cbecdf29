package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Multimodal

/** Multimodal demo in two acts: (1) the stub-codec plumbing over text
  * payloads, (2) the REAL pure-JVM codec pipeline — synthesized P6 PPM and
  * PCM WAV payloads decoded, feature-extracted, resized and frame-sampled
  * by graft.ops.Codecs. Usage: runMain graft.tools.MediaDemo [docsParquet] */
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

    // ---- act 2: real codecs over synthesized payloads ----
    import org.apache.spark.sql.functions.{col, lit, udf}
    val ids = spark.read.parquet(path).limit(200)
      .select(col("doc_id").cast("long").as("id"))
    val ppmUdf = udf(Multimodal.synthPpm _)
    val wavUdf = udf(Multimodal.synthWav _)

    val images = ids.select(col("id"),
        lit("image/x-portable-pixmap").as("kind"), ppmUdf(col("id")).as("media"))
      .as[Multimodal.MediaRow].cache()
    val ifeats = Multimodal.decodeImages(spark, images)
    println(s"[media-demo] decoded images=${ifeats.count()}")
    ifeats.toDF().show(3, truncate = false)

    val shrunk = Multimodal.resizeImages(spark, images, targetW = 3)
    val widths = shrunk
      .map(r => graft.ops.Codecs.decodePpm(r.media).width).distinct().collect()
    println(s"[media-demo] resized widths=${widths.mkString(",")}")
    require(widths.sameElements(Array(3)), "resize must land on targetW")

    val audio = ids.select(col("id"), lit("audio/wav").as("kind"),
        wavUdf(col("id")).as("media")).as[Multimodal.MediaRow]
    val afeats = Multimodal.decodeAudio(spark, audio)
    println(s"[media-demo] decoded audio=${afeats.count()}")
    afeats.toDF().show(3, truncate = false)

    // 3-frame concatenated-P6 streams, every 2nd frame sampled
    val streams = ids.map { r =>
      val id = r.getLong(0)
      Multimodal.MediaRow(id, "video/x-ppm-stream",
        Multimodal.synthPpm(id) ++ Multimodal.synthPpm(id + 1) ++
          Multimodal.synthPpm(id + 2))
    }
    val vframes = Multimodal.sampleImageFrames(spark, streams, stride = 2)
    println(s"[media-demo] sampled real frames=${vframes.count()} " +
      s"from ${streams.count()} streams")

    spark.stop()
    println("[media-demo] OK")
  }
}
