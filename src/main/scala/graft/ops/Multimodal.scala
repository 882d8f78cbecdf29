package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and per-batch "decode / feature-extract"
  * runs as a partition-wise operator (the Scala analogue of a Pandas
  * `mapInPandas` batch UDF).
  *
  * Decode is REAL for formats a bare JVM can parse — binary P6 PPM images
  * and RIFF/PCM-16 WAV audio via [[Codecs]] (decodeImages / decodeAudio /
  * resizeImages / sampleImageFrames below, oracled by q43/q44). For
  * formats that need a native codec (JPEG/MP3/H.264 — no such libraries
  * ship in this container) the original deterministic STUB stands in:
  * it derives pseudo dimensions from the byte stream, keeping the
  * Spark-side contract (schema, binary transport, partition-batched
  * execution, feature output shape) real and tested; swapping `decodeStub`
  * for a JNI/lib decoder is the only change needed at scale. */
object Multimodal {

  case class MediaRow(id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Int, head_byte: Int,
      width: Int, height: Int, checksum: Long)

  /** STUB decoder: deterministic fake in place of a real image/audio codec
    * (`???` in spirit — see class doc). Real implementations decode
    * `media` here, one partition-batch at a time. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.media.length
    val head = if (n == 0) 0 else r.media(0) & 0xff
    var sum = 0L
    var i = 0
    while (i < n) { sum = sum * 31 + (r.media(i) & 0xff); i += 1 }
    MediaFeatures(r.id, r.kind, n, head,
      width = math.floorMod(n, 640), height = math.floorMod(n * 7, 480),
      checksum = sum)
  }

  /** Partition-batched feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * deterministic fake rescales the fake dimensions and subsamples bytes
    * so output size tracks the scale factor (plumbing + schema real). */
  def resizeStub(r: MediaRow, targetW: Int): MediaRow = {
    val f = decodeStub(r)
    val scale = if (f.width <= 0) 1.0 else targetW.toDouble / f.width
    val outLen = math.max(1, math.min(r.media.length,
      math.round(r.media.length * scale).toInt))
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = r.media((i.toLong * r.media.length / outLen).toInt)
      i += 1
    }
    MediaRow(r.id, r.kind, out)
  }

  /** STUB frame sampling: treats the payload as `n` fixed-size frames and
    * emits every `stride`-th frame as its own row — the shape of video
    * frame extraction (one input row -> many frame rows), deterministic. */
  def sampleFramesStub(r: MediaRow, frameBytes: Int, stride: Int): Seq[MediaRow] = {
    val nFrames = math.max(1, r.media.length / math.max(1, frameBytes))
    require(nFrames < FrameIdSpan,
      s"sampleFrames: payload of id=${r.id} splits into $nFrames frames " +
        s">= $FrameIdSpan - frame ids (id*span+f) would collide with the " +
        "next document's; raise frameBytes/stride")
    (0 until nFrames by math.max(1, stride)).map { f =>
      val from = f * frameBytes
      val until = math.min(r.media.length, from + frameBytes)
      MediaRow(r.id * FrameIdSpan + f, s"${r.kind};frame=$f",
        java.util.Arrays.copyOfRange(r.media, from, until))
    }
  }

  def resize(spark: SparkSession, media: Dataset[MediaRow], targetW: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.map(resizeStub(_, targetW)))
  }

  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      frameBytes: Int, stride: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(sampleFramesStub(_, frameBytes, stride)))
  }

  /** Frame-id derivation span: frame f of doc d gets id d*span+f, so a
    * payload must split into fewer than span frames or ids would collide
    * with the NEXT document's (both sampling paths require this loudly). */
  val FrameIdSpan = 1000000L

  /** Lift any (id, text) table into a media table (utf-8 bytes as the
    * opaque payload) — used to exercise the plumbing without real media.
    * The id must already be integral: a silent cast of a string/double id
    * would null-out or collide ids (same guard as SimSearch). */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
      kind: String = "text/plain"): DataFrame = {
    SimSearch.requireIntegralId(docs, idCol, "fromText")
    docs.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("media"))
  }

  // ---- REAL decode paths (graft.ops.Codecs: pure-JVM P6 PPM / PCM WAV).
  // The stub above remains the documented stand-in for formats that need a
  // native codec; these run the genuine parse → feature pipeline.

  case class ImageFeatures(id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, mean_lum: Double)
  case class AudioFeatures(id: Long, channels: Int, sample_rate: Int,
      n_samples: Int, rms: Double, peak: Int)

  private def decodeImageRow(r: MediaRow): ImageFeatures = {
    val img = Codecs.decodePpm(r.media)
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < n) {
      sr += img.pixels(3 * p) & 0xff
      sg += img.pixels(3 * p + 1) & 0xff
      sb += img.pixels(3 * p + 2) & 0xff
      p += 1
    }
    val mr = sr.toDouble / n
    val mg = sg.toDouble / n
    val mb = sb.toDouble / n
    ImageFeatures(r.id, img.width, img.height, mr, mg, mb,
      0.299 * mr + 0.587 * mg + 0.114 * mb)
  }

  /** Decode P6 payloads and extract channel statistics. Channel sums are
    * 64-bit integer (exact), so mean_* are `exact_sum / n` — bit-identical
    * to any engine computing the same division (the q43 oracle). */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeImageRow))
  }

  /** Dual-route image decode — the reference's valid/invalid reject channel
    * (mrtarget/modules/Evidences.py:290-308) applied to binary payloads:
    * parseable rows emit features; rows whose payload throws are routed
    * with the parse error as `explanation` (id, kind, explanation). The
    * tagged plan is persisted for the scope of `use` so consuming BOTH
    * channels decodes each payload once (caching `media` upstream cannot
    * do that — it only avoids the re-read, not the re-decode), mirroring
    * ops.Routing's evaluate-once contract. */
  def routeImages[T](spark: SparkSession, media: Dataset[MediaRow])(
      use: (Dataset[ImageFeatures], DataFrame) => T): T = {
    import spark.implicits._
    val tagged: Dataset[(Long, String, Option[ImageFeatures], Option[String])] =
      media.mapPartitions(_.map { r =>
        try (r.id, r.kind, Some(decodeImageRow(r)), None)
        catch {
          // NonFatal, not just IllegalArgumentException: the dual route
          // exists to isolate bad rows, so ANY per-row decode failure must
          // land in the invalid channel rather than fail the whole job
          case scala.util.control.NonFatal(e) =>
            (r.id, r.kind, None,
              Some(Option(e.getMessage).getOrElse(e.toString)))
        }
      })
    val cached = tagged.persist()
    try {
      val valid = cached.flatMap(_._3)
      val invalid = cached.filter(_._4.isDefined)
        .map(t => (t._1, t._2, t._4.get))
        .toDF("id", "kind", "explanation")
      use(valid, invalid)
    } finally cached.unpersist()
  }

  /** Decode PCM WAV payloads: frame count, RMS amplitude, peak. The
    * squared-sample sum is 64-bit integer (exact) like decodeImages. */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val a = Codecs.decodeWav(r.media)
      var ss = 0L
      var peak = 0
      var i = 0
      while (i < a.samples.length) {
        val s = a.samples(i).toInt
        ss += s.toLong * s
        val m = math.abs(s)
        if (m > peak) peak = m
        i += 1
      }
      val n = a.samples.length
      AudioFeatures(r.id, a.channels, a.sampleRate, n / a.channels,
        if (n == 0) 0.0 else math.sqrt(ss.toDouble / n), peak)
    })
  }

  /** Real nearest-neighbor resize of P6 payloads to `targetW` (height
    * scales to keep aspect): decode → resample → re-encode, one partition
    * batch at a time. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
      targetW: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = Codecs.decodePpm(r.media)
      val h2 = math.max(1, (img.height.toLong * targetW / img.width).toInt)
      MediaRow(r.id, r.kind,
        Codecs.encodePpm(Codecs.resizeNearest(img, targetW, h2)))
    })
  }

  /** Real frame sampling over concatenated-P6 streams: every `stride`-th
    * frame becomes its own single-image row (1 row → n rows). */
  def sampleImageFrames(spark: SparkSession, media: Dataset[MediaRow],
      stride: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(stride >= 1, s"stride $stride")
    media.mapPartitions(_.flatMap { r =>
      val frames = Codecs.splitPpmFrames(r.media)
      require(frames.length < FrameIdSpan,
        s"sampleImageFrames: id=${r.id} has ${frames.length} frames >= " +
          s"$FrameIdSpan - frame ids would collide across documents")
      frames.zipWithIndex.collect {
        case (img, f) if f % stride == 0 =>
          MediaRow(r.id * FrameIdSpan + f, s"${r.kind};frame=$f",
            Codecs.encodePpm(img))
      }
    })
  }

  // ---- deterministic media synthesis (tests + the q43/q44 oracles):
  // payloads are pure closed-form functions of the id, so an external
  // engine can recompute the decoded features without any codec.

  /** P6 image: w=4+(id%5), h=3+(id%4), pixel byte o = (id*31+o) mod 256. */
  def synthPpm(id: Long): Array[Byte] = {
    val w = 4 + (id % 5).toInt
    val h = 3 + (id % 4).toInt
    val px = new Array[Byte](w * h * 3)
    var o = 0
    while (o < px.length) {
      px(o) = java.lang.Long.remainderUnsigned(id * 31 + o, 256).toByte
      o += 1
    }
    Codecs.encodePpm(Codecs.Image(w, h, px))
  }

  /** Mono 8 kHz PCM WAV: n=50+(id%100) samples,
    * sample i = ((id*7919 + i*104729) mod 65536) - 32768. */
  def synthWav(id: Long): Array[Byte] = {
    val n = 50 + (id % 100).toInt
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (java.lang.Long.remainderUnsigned(
        id * 7919 + i.toLong * 104729, 65536) - 32768).toShort
      i += 1
    }
    Codecs.encodeWav(Codecs.Audio(1, 8000, s))
  }
}
