package graft.ops

/** Pure-JVM media codecs: binary P6 PPM images and RIFF/PCM-16 WAV audio,
  * parsed byte-by-byte with no external libraries.
  *
  * These make [[Multimodal]]'s decode path REAL for the two classic
  * container formats a bare JVM can handle; formats that genuinely need a
  * native codec (JPEG/MP3/H.264) keep the documented deterministic stub.
  * The reference pipeline treats payloads as opaque blobs end-to-end, so
  * there is no reference semantic to match here — the contract is the
  * format specs themselves (netpbm P6; RIFF/WAVE with even-padded chunks),
  * pinned by goldens in CodecsSpec and by the closed-form DuckDB oracles
  * of q43/q44 (decode of deterministically synthesized media must equal
  * the oracle's arithmetic recomputation of the same pixels/samples).
  *
  * Everything here is a pure function of the input bytes — safe to call
  * from any partition at any parallelism. Malformed input throws
  * IllegalArgumentException with the offset, to be routed through the
  * valid/invalid channel (ops.Routing) like every other parse failure. */
object Codecs {

  /** RGB, row-major, 3 bytes/pixel, maxval 255. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"image: ${pixels.length} bytes for ${width}x$height")
  }

  /** Interleaved PCM-16 samples ([L R L R ...] when stereo). */
  final case class Audio(channels: Int, sampleRate: Int, samples: Array[Short])

  // ---------------------------------------------------------------- PPM

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Parse one P6 image starting at `from`; returns (image, end offset).
    * Handles arbitrary whitespace and '#' comment lines in the header
    * (netpbm allows both). */
  private def decodePpmAt(b: Array[Byte], from: Int): (Image, Int) = {
    var i = from
    def fail(msg: String) =
      throw new IllegalArgumentException(s"ppm @$i: $msg")
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      // accumulate in Long: an Int accumulator can WRAP past the bound
      // check (e.g. "4294967297" lands on 1 and decodes with bogus
      // dimensions instead of failing the hostile-header contract)
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
        if (v > 1000000000L) fail("header integer out of range")
      }
      if (!any) fail("expected integer")
      v.toInt
    }
    if (b.length - i < 2 || b(i) != 'P' || b(i + 1) != '6')
      fail("not a P6 stream")
    i += 2
    val w = int()
    val h = int()
    val maxv = int()
    if (maxv != 255) fail(s"unsupported maxval $maxv (only 8-bit)")
    if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
    // exactly ONE whitespace byte separates header from pixels — anything
    // else (e.g. CRLF) would silently shift the pixel data by a byte
    if (i >= b.length || !(b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t'))
      fail("expected single whitespace after maxval")
    i += 1
    // hostile-header guard: w*h*3 must not wrap Int (a 22-byte payload
    // declaring 2 x 715827883 would otherwise pass every length check and
    // blow up later with an un-routable ArrayIndexOutOfBoundsException)
    val n64 = w.toLong * h * 3
    if (n64 > Int.MaxValue - 16) fail(s"pixel payload too large ($n64 bytes)")
    val n = n64.toInt
    if (b.length - i < n) fail(s"truncated: need $n pixel bytes")
    (Image(w, h, java.util.Arrays.copyOfRange(b, i, i + n)), i + n)
  }

  /** Single-image decode demands EXACT consumption: binary PPM cannot
    * distinguish a stray whitespace byte after maxval (CRLF-written
    * headers) from pixel data, but the off-by-one always leaves trailing
    * bytes on a single image — so reject them instead of silently
    * decoding shifted pixels. Concatenated streams go through
    * [[splitPpmFrames]]. */
  def decodePpm(bytes: Array[Byte]): Image = {
    val (img, end) = decodePpmAt(bytes, 0)
    if (end != bytes.length)
      throw new IllegalArgumentException(
        s"ppm @$end: ${bytes.length - end} trailing bytes after pixel data " +
          "(CRLF-after-maxval corruption, or a frame stream? use splitPpmFrames)")
    img
  }

  /** Split a concatenated-P6 stream ("video": frames back to back, the
    * netpbm animation convention) into its frames. */
  def splitPpmFrames(bytes: Array[Byte]): Seq[Image] = {
    val out = Seq.newBuilder[Image]
    var i = 0
    while (i < bytes.length) {
      val (img, next) = decodePpmAt(bytes, i)
      out += img
      i = next
    }
    out.result()
  }

  /** Nearest-neighbor resample: source pixel of output (x,y) is
    * (x*w/w2, y*h/h2) — integer floor, deterministic. */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0, s"resize to ${w2}x$h2")
    require(w2.toLong * h2 * 3 <= Int.MaxValue - 16,
      s"resize target ${w2}x$h2 overflows the pixel buffer")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  // ---------------------------------------------------------------- WAV

  def encodeWav(a: Audio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2) // byte rate
      .putShort((a.channels * 2).toShort) // block align
      .putShort(16) // bits/sample
    buf.put("data".getBytes).putInt(dataBytes)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking RIFF parser: finds `fmt ` and `data` wherever they sit,
    * skips unknown chunks (LIST/INFO/...), honors the spec's even-byte
    * chunk padding. Only uncompressed PCM-16 is supported. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fail(msg: String) =
      throw new IllegalArgumentException(s"wav @${buf.position()}: $msg")
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (bytes.length < 12 || fourcc() != "RIFF") fail("not a RIFF stream")
    buf.getInt // declared riff size; trust actual length instead
    if (fourcc() != "WAVE") fail("not a WAVE form")
    var channels = -1
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (channels < 0 || samples == null)) {
      val id = fourcc()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"bad chunk size $size")
      val next = buf.position() + size + (size & 1) // odd chunks pad 1 byte
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val audioFormat = buf.getShort
          if (audioFormat != 1) fail(s"unsupported format $audioFormat (PCM only)")
          channels = buf.getShort.toInt
          // the short reads signed: 0xFFFF comes back -1, and 0 would make
          // every frames-per-channel division downstream explode
          if (channels < 1 || channels > 1024) fail(s"bad channel count $channels")
          sampleRate = buf.getInt
          if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          if (bits != 16) fail(s"unsupported $bits bits/sample (16 only)")
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip
      }
      buf.position(math.min(next, bytes.length))
    }
    if (channels < 0) fail("missing fmt chunk")
    if (samples == null) fail("missing data chunk")
    Audio(channels, sampleRate, samples)
  }
}
