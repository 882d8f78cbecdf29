package graft.index

/** 64-bit string hash used for deterministic segment assignment and salting.
  * FNV-1a over UTF-8 bytes with a splitmix64 finalizer: pure function of the
  * string, identical on driver (oracle) and executors (builder UDF), so doc
  * placement never depends on execution order or parallelism. */
object Hashing extends Serializable {
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer for avalanche
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def segmentOf(url: String, numSegments: Int): Int =
    math.floorMod(hash64(url), numSegments.toLong).toInt
}
