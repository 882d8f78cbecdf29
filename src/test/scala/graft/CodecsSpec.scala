package graft

import graft.ops.{Codecs, Multimodal}
import graft.ops.Codecs.{Audio, Image}

/** Byte-level goldens for the pure-JVM PPM/WAV codecs plus the Spark
  * decode paths built on them. */
class CodecsSpec extends SparkSuite {
  import spark.implicits._

  private def img(w: Int, h: Int)(bytes: Int*): Image =
    Image(w, h, bytes.map(_.toByte).toArray)

  test("P6 decode golden: minimal header") {
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val d = Codecs.decodePpm(bytes)
    assert(d.width === 2)
    assert(d.height === 1)
    assert(d.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("P6 header tolerates comments and mixed whitespace (netpbm spec)") {
    val bytes = "P6 # a comment\n # another\n\t2\r\n1 \n255 ".getBytes("US-ASCII") ++
      Array[Byte](9, 8, 7, 6, 5, 4)
    val d = Codecs.decodePpm(bytes)
    assert((d.width, d.height) === (2, 1))
    assert(d.pixels.toSeq === Seq[Byte](9, 8, 7, 6, 5, 4))
  }

  test("P6 encode∘decode is identity; malformed streams throw") {
    val o = img(3, 2)(0, 64, 128, 255, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14)
    val back = Codecs.decodePpm(Codecs.encodePpm(o))
    assert(back.width === o.width && back.height === o.height)
    assert(back.pixels.toSeq === o.pixels.toSeq)
    intercept[IllegalArgumentException](Codecs.decodePpm("P5\n1 1\n255\nxxx".getBytes))
    intercept[IllegalArgumentException](Codecs.decodePpm("P6\n2 2\n255\nab".getBytes))
    intercept[IllegalArgumentException](Codecs.decodePpm("P6\n1 1\n65535\n".getBytes ++ Array[Byte](1, 2, 3)))
    // hostile/degenerate headers must fail as IllegalArgumentException,
    // never wrap into a later ArrayIndexOutOfBounds/ArithmeticException
    intercept[IllegalArgumentException]( // w*h*3 wraps Int
      Codecs.decodePpm("P6\n2 715827883\n255\n".getBytes ++ Array[Byte](1, 2)))
    intercept[IllegalArgumentException]( // zero-area image
      Codecs.decodePpm("P6\n0 5\n255\n".getBytes))
    intercept[IllegalArgumentException]( // CRLF after maxval shifts pixels
      Codecs.decodePpm("P6\n1 1\n255\r\n".getBytes ++ Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException]( // 10-digit dimension
      Codecs.decodePpm("P6\n1 12345678901\n255\n".getBytes))
    intercept[IllegalArgumentException]( // 2^32+1: Int accumulator would
      // WRAP to 1 and decode as a bogus 1-wide image instead of failing
      Codecs.decodePpm("P6\n4294967297 1\n255\n".getBytes ++ Array[Byte](1, 2, 3)))
  }

  test("nearest-neighbor resize goldens") {
    val o = img(2, 2)(10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40)
    val down = Codecs.resizeNearest(o, 1, 1)
    assert(down.pixels.toSeq === Seq[Byte](10, 10, 10)) // floor mapping -> (0,0)
    val up = Codecs.resizeNearest(o, 4, 4)
    assert((up.width, up.height) === (4, 4))
    // each source pixel becomes a 2x2 block
    assert(up.pixels(0) === 10.toByte)            // (0,0)
    assert(up.pixels((0 * 4 + 2) * 3) === 20.toByte) // (2,0) -> src (1,0)
    assert(up.pixels((2 * 4 + 0) * 3) === 30.toByte) // (0,2) -> src (0,1)
    assert(up.pixels((3 * 4 + 3) * 3) === 40.toByte) // (3,3) -> src (1,1)
  }

  test("concatenated-P6 frame split + strided sampling") {
    val frames = (0 until 5).map(f => img(1, 1)(f, f, f))
    val stream = frames.map(Codecs.encodePpm).reduce(_ ++ _)
    val split = Codecs.splitPpmFrames(stream)
    assert(split.size === 5)
    assert(split.map(_.pixels(0).toInt) === Seq(0, 1, 2, 3, 4))

    val media = Seq(Multimodal.MediaRow(7L, "video/x-ppm-stream", stream)).toDS()
    val sampled = Multimodal.sampleImageFrames(spark, media, stride = 2)
      .collect().sortBy(_.id)
    assert(sampled.map(_.id).toSeq === Seq(7000000L, 7000002L, 7000004L))
    assert(sampled.map(r => Codecs.decodePpm(r.media).pixels(0).toInt).toSeq
      === Seq(0, 2, 4))
  }

  test("WAV encode∘decode identity; chunk walker skips unknown chunks") {
    val a = Audio(2, 44100, Array[Short](0, 100, -100, 32767, -32768, 5))
    val back = Codecs.decodeWav(Codecs.encodeWav(a))
    assert(back.channels === 2)
    assert(back.sampleRate === 44100)
    assert(back.samples.toSeq === a.samples.toSeq)

    // splice an odd-sized LIST chunk between WAVE and fmt: the parser must
    // skip it (with the spec's pad byte) and still find fmt/data
    val enc = Codecs.encodeWav(a)
    val buf = java.nio.ByteBuffer
      .allocate(enc.length + 8 + 6) // 5-byte chunk + 1 pad byte
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(enc, 0, 12) // RIFF <size> WAVE
    buf.put("LIST".getBytes).putInt(5).put(Array[Byte](1, 2, 3, 4, 5, 0))
    buf.put(enc, 12, enc.length - 12)
    val withList = buf.array()
    // fix the riff size field (unchecked by our parser, but be well-formed)
    val spliced = Codecs.decodeWav(withList)
    assert(spliced.samples.toSeq === a.samples.toSeq)

    intercept[IllegalArgumentException](Codecs.decodeWav("RIFFxxxxNOPE".getBytes))

    // fmt declaring 0 channels must fail in decodeWav, not divide-by-zero
    // later in decodeAudio
    val zeroCh = Codecs.encodeWav(Audio(1, 8000, Array[Short](1)))
    zeroCh(22) = 0 // channels little-endian low byte inside fmt
    intercept[IllegalArgumentException](Codecs.decodeWav(zeroCh))
  }

  test("image/audio feature extraction matches hand computation") {
    val i = img(2, 1)(10, 20, 30, 20, 40, 60) // mr=15 mg=30 mb=45
    val feats = Multimodal.decodeImages(spark,
      Seq(Multimodal.MediaRow(1L, "image/x-portable-pixmap",
        Codecs.encodePpm(i))).toDS()).collect().head
    assert(feats.width === 2 && feats.height === 1)
    assert(feats.mean_r === 15.0 && feats.mean_g === 30.0 && feats.mean_b === 45.0)
    assert(feats.mean_lum === 0.299 * 15.0 + 0.587 * 30.0 + 0.114 * 45.0)

    val w = Audio(1, 8000, Array[Short](3, -4)) // rms = sqrt((9+16)/2)
    val af = Multimodal.decodeAudio(spark,
      Seq(Multimodal.MediaRow(2L, "audio/wav", Codecs.encodeWav(w))).toDS())
      .collect().head
    assert(af.n_samples === 2 && af.peak === 4)
    assert(af.rms === math.sqrt(25.0 / 2))
  }

  test("dual-route image decode: parse failures carry explanations") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image/x-portable-pixmap", Multimodal.synthPpm(1L)),
      Multimodal.MediaRow(2L, "image/x-portable-pixmap", "P6\n9 9\n255\nxx".getBytes),
      Multimodal.MediaRow(3L, "image/x-portable-pixmap", Array[Byte](1, 2, 3))
    ).toDS().cache()
    Multimodal.routeImages(spark, media) { (valid, invalid) =>
      assert(valid.collect().map(_.id).toSeq === Seq(1L))
      val inv = invalid.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(inv.keySet === Set(2L, 3L))
      assert(inv(2L).contains("truncated"))
      assert(inv(3L).contains("not a P6"))
    }
    media.unpersist()
  }

  test("synthesized media decode matches the closed form (q43/q44 contract)") {
    for (id <- Seq(0L, 1L, 17L, 123L)) {
      val im = Codecs.decodePpm(Multimodal.synthPpm(id))
      assert(im.width === 4 + (id % 5).toInt)
      assert(im.height === 3 + (id % 4).toInt)
      im.pixels.zipWithIndex.foreach { case (b, o) =>
        assert((b & 0xff) === ((id * 31 + o) % 256).toInt, s"id=$id o=$o")
      }
      val au = Codecs.decodeWav(Multimodal.synthWav(id))
      assert(au.samples.length === 50 + (id % 100).toInt)
      au.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.toInt === (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toInt)
      }
    }
  }
}
