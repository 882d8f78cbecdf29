package graft.index

/** 64-bit string hash used for deterministic segment assignment and salting.
  * FNV-1a over UTF-8 bytes with a splitmix64 finalizer: pure function of the
  * string, identical on driver (oracle) and executors (builder UDF), so doc
  * placement never depends on execution order or parallelism. */
object Hashing extends Serializable {
  def hash64(s: String): Long =
    hash64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def segmentOf(url: String, numSegments: Int): Int =
    math.floorMod(hash64(url), numSegments.toLong).toInt

  /** [[hash64]] over a byte array — FNV-1a is defined on UTF-8 bytes, so
    * hashing a UTF8String's bytes directly (no String materialization)
    * yields the identical value. Used by the codegen'd segment-assignment
    * expression on the index build's hot path. */
  def hash64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Segment of a url handed over as Spark's native UTF8String. Public and
    * stable-named: whole-stage-codegen'd expressions call it by name. */
  def segmentOfUtf8(url: org.apache.spark.unsafe.types.UTF8String,
      numSegments: Int): Int =
    math.floorMod(hash64Bytes(url.getBytes), numSegments.toLong).toInt

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(s), big-endian, as a signed long. Used where an
    * EXTERNAL engine must recompute the hash (the DuckDB correctness
    * oracles): `('0x' || substr(md5(s), 1, 16))::UBIGINT` reproduces the
    * same 64-bit pattern. Prefer [[hash64]] everywhere else (faster). */
  def md5Hash64(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong
  }
}
