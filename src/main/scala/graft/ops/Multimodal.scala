package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and per-batch "decode / feature-extract"
  * runs as a partition-wise operator (the Scala analogue of a Pandas
  * `mapInPandas` batch UDF).
  *
  * The actual codec is a STUB — no image/audio libraries ship in this
  * container — replaced by a deterministic fake that derives pseudo
  * dimensions from the byte stream. The Spark-side contract (schema,
  * binary transport, partition-batched execution, feature output shape)
  * is real and tested; swapping `decodeStub` for a JNI/lib decoder is the
  * only change needed at scale. */
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
    (0 until nFrames by math.max(1, stride)).map { f =>
      val from = f * frameBytes
      val until = math.min(r.media.length, from + frameBytes)
      MediaRow(r.id * 1000000L + f, s"${r.kind};frame=$f",
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

  /** Lift any (id, text) table into a media table (utf-8 bytes as the
    * opaque payload) — used to exercise the plumbing without real media. */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
      kind: String = "text/plain"): DataFrame =
    docs.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("media"))
}
