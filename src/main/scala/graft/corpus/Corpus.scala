package graft.corpus

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page, the engine's only external input shape
  * (BASELINE.json `input_hint`): (url, warc_ts, html, text, lang). */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic seeded synthesis of the input table plus the pinned pure
  * HTML->text extractor. `Html.extract(page.html)` is byte-identical to
  * `page.text` for every url, at every parallelism level — the per-row
  * invariant the north rule demands (golden SHA-256s pinned in CorpusSpec).
  *
  * Term distribution is Zipfian (exponent 1.15 over the vocabulary) so head
  * terms land in >30% of documents, deliberately exercising the index
  * builder's skew handling. Doc length is log-normal, median ~120 tokens.
  * Everything is a pure function of (seed, rowId): generation order and
  * partitioning cannot change content.
  */
object Corpus {

  /** Words shared with the driver's synthetic `documents` table plus a long
    * synthetic tail; queries against either corpus use the same vocabulary. */
  private val headWords: Array[String] = Array(
    "the", "a", "data", "spark", "table", "scan", "merge", "join", "sort",
    "filter", "query", "row", "column", "key", "value", "order", "group",
    "window", "batch", "stream", "hash", "part", "line", "agg", "customer",
    "small", "big", "fast", "slow", "vector", "dup", "index", "term",
    "posting", "shard", "segment", "score", "rank", "crawl", "web", "page",
    "anti-tnf", "wi-fi", "o'brien's", "cache", "disk", "block", "max")

  private val vocabCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[String]]()
  def vocab(size: Int): Array[String] =
    vocabCache.computeIfAbsent(size, { s =>
      Array.tabulate(s)(i => if (i < headWords.length) headWords(i) else s"w${i}x")
    })

  /** Cumulative Zipf(1.15) distribution over ranks 1..size. */
  private val cdfCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def zipfCdf(size: Int): Array[Double] =
    cdfCache.computeIfAbsent(size, { s =>
      val w = Array.tabulate(s)(i => math.pow(i + 1.0, -1.15))
      val total = w.sum
      val cdf = new Array[Double](s)
      var acc = 0.0
      var i = 0
      while (i < s) { acc += w(i) / total; cdf(i) = acc; i += 1 }
      cdf(s - 1) = 1.0
      cdf
    })

  private def sampleZipf(cdf: Array[Double], u: Double): Int = {
    var lo = 0
    var hi = cdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cdf(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  private val langs = Array("en", "en", "en", "en", "en", "en", "en", "en",
    "en", "en", "en", "en", "en", "en", "en", "en", "en", "en", "en", "es",
    "de", "fr", "zh")

  private val epoch = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  /** Pure page generator: content depends only on (seed, i). */
  def genPage(i: Long, seed: Long, vocabSize: Int, medianLen: Int): Page = {
    val rng = new java.util.Random(seed * 0x9e3779b97f4a7c15L + i)
    val v = vocab(vocabSize)
    val cdf = zipfCdf(vocabSize)
    val len = math.max(3,
      math.round(medianLen * math.exp(0.6 * rng.nextGaussian())).toInt)
    val sb = new StringBuilder(len * 6)
    var t = 0
    while (t < len) {
      if (t > 0) sb.append(' ')
      sb.append(v(sampleZipf(cdf, rng.nextDouble())))
      t += 1
    }
    val text = sb.toString
    val url = s"https://example${math.floorMod(i * 2654435761L, 1000)}.org/p/$i"
    Page(url, new Timestamp(epoch + i * 1000L), Html.wrap(url, text), text,
      langs(rng.nextInt(langs.length)))
  }

  /** The synthesized pages table as a typed Dataset. NOTE: urls are a pure
    * function of the row id, so batches meant to be url-disjoint (e.g. for
    * IndexBuilder.append) must use disjoint [startId, startId+n) ranges. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
      vocabSize: Int = 5000, medianLen: Int = 120,
      numPartitions: Int = 0, startId: Long = 0L): Dataset[Page] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(startId, startId + n, 1, parts)
      .map(i => genPage(i, seed, vocabSize, medianLen))
  }
}

/** Pinned HTML wrap/extract pair. `extract(wrap(url, text)) == text`
  * byte-for-byte; extraction strips the deterministic boilerplate and
  * un-escapes entities. This stands in for the reference's per-record
  * "extractor" whose output must be byte-identical per url across runs. */
object Html {
  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  def wrap(url: String, text: String): Array[Byte] =
    (s"<!DOCTYPE html><html><head><title>${escape(url)}</title></head>" +
      s"<body><nav>home | about | contact</nav><article>${escape(text)}" +
      "</article><footer>copyright example.org</footer></body></html>")
      .getBytes(UTF_8)

  /** Extract the article text from a wrapped page (byte-identical to the
    * original `text`). Returns empty string when markers are absent. */
  def extract(html: Array[Byte]): String = {
    val s = new String(html, UTF_8)
    val a = s.indexOf("<article>")
    val b = s.indexOf("</article>")
    if (a < 0 || b < 0 || b < a) "" else unescape(s.substring(a + 9, b))
  }
}
