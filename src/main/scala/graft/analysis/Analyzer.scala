package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Tokenizer chain replicating the reference's Elasticsearch "default"
  * analyzer: whitespace tokenizer -> lowercase -> word_delimiter filter with
  * `generate_word_parts=true, generate_number_parts=true,
  * preserve_original=true, split_on_case_change=false,
  * split_on_numerics=false, stem_english_possessive=true`, no catenation
  * (reference: mrtarget/resources/es/sea_settings.json:22-51; the "default"
  * analyzer block applies it to every text field).
  *
  * This chain is the pinned "reference extractor" anchor: the index build,
  * the query parser and the test oracle all share this single function, so
  * token streams are byte-identical across parallelism levels.
  *
  * Semantics (golden fixtures in FIXTURES.md §2 / AnalyzerSpec):
  *  - split on Unicode whitespace, drop empties (multiple spaces collapse)
  *  - lowercase (ROOT locale)
  *  - per whitespace token: subword parts are maximal runs of [a-z0-9]
  *    (apostrophe IS a delimiter, matching Lucene WordDelimiterFilter's
  *    default char types; case/numeric transitions do not split because
  *    split_on_case_change / split_on_numerics are false and input is
  *    already lowercased)
  *  - stem_english_possessive: a "'s" immediately following a part whose
  *    last char is a letter, with no word char after it, is consumed (the
  *    documented ES example: "O'Neil's" -> parts [o, neil], and with
  *    preserve_original the stream is [o'neil's, o, neil])
  *  - the original token is preserved ahead of its parts unless it equals
  *    its single part; tokens with no alphanumeric content are dropped
  */
object Analyzer extends Serializable {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  @inline private def isAlpha(c: Char): Boolean = c >= 'a' && c <= 'z'

  /** Emit tokens for one whitespace-delimited, already-lowercased word. */
  private def emit(orig: String, out: ArrayBuffer[String]): Unit = {
    // collect maximal runs of word chars
    var i = 0
    val n = orig.length
    var nParts = 0
    var firstPart: String = null
    val parts = new ArrayBuffer[String](2)
    while (i < n) {
      while (i < n && !isWordChar(orig.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(orig.charAt(i))) i += 1
      if (i > start) {
        parts += orig.substring(start, i)
        if (nParts == 0) firstPart = parts(0)
        nParts += 1
        // stem_english_possessive: consume a trailing "'s" after a
        // letter-final part (Lucene WordDelimiterIterator.endsWithPossessive)
        if (isAlpha(orig.charAt(i - 1)) && i + 1 < n &&
            orig.charAt(i) == '\'' && orig.charAt(i + 1) == 's' &&
            (i + 2 == n || !isWordChar(orig.charAt(i + 2))))
          i += 2
      }
    }
    if (nParts == 0) return // pure punctuation: dropped
    if (nParts == 1 && firstPart == orig) out += orig
    else {
      out += orig // preserve_original
      out ++= parts
    }
  }

  /** Full analyzer chain: text -> token stream (order preserved). */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[String](text.length / 6 + 4)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start)
        emit(text.substring(start, i).toLowerCase(java.util.Locale.ROOT), out)
    }
    out.toArray
  }

  /** Term-frequency map of the analyzed text (map-side, no shuffle). */
  def termFreqs(text: String): Map[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    tokenize(text).foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
    m.toMap
  }

  /** The reference's "edgeNGram_filter" — despite its name an ES `ngram`
    * filter with min_gram=4, max_gram=10 (sea_settings.json:11-21): every
    * substring of length 4..10 of every analyzed token, used for the
    * autocomplete/suggest fields. */
  def ngrams(text: String, minGram: Int = 4, maxGram: Int = 10): Array[String] = {
    val out = new ArrayBuffer[String]()
    tokenize(text).foreach { tok =>
      var len = minGram
      while (len <= maxGram) {
        var i = 0
        while (i + len <= tok.length) {
          out += tok.substring(i, i + len)
          i += 1
        }
        len += 1
      }
    }
    out.toArray
  }

  /** "onechunk"/fingerprint analyzer of the reference (gen_settings.json:
    * 36-44): keyword tokenizer -> lowercase -> asciifolding -> fingerprint
    * filter. A keyword tokenizer emits the WHOLE text as one token, so the
    * fingerprint filter's sort/dedup is an identity and the chain reduces
    * to lowercase + asciifold of the full string — the reference uses it
    * to normalize entity labels for exact keyword matching. (Bag-of-words
    * content fingerprinting is a different operator:
    * TextOps.fingerprintExpr, oracled as q12.) */
  def fingerprint(text: String): String =
    graft.functions.Normalize.nfkdAscii(
      text.toLowerCase(java.util.Locale.ROOT))

  // ---- Catalyst-facing entry points (called from generated code) ----

  /** termFreqs straight to Catalyst MapData, avoiding the Scala-UDF
    * row-conversion layer (used by TermFreqsExpr.doGenCode). */
  def termFreqsCatalyst(
      text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.MapData = {
    val toks = tokenize(if (text == null) "" else text.toString)
    val m = new java.util.LinkedHashMap[String, Int](toks.length)
    toks.foreach(t => m.merge(t, 1, (a, b) => a + b))
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
  }

  /** tokenize straight to Catalyst ArrayData (used by TokenizeExpr). */
  def tokenizeCatalyst(
      text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(if (text == null) "" else text.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)
        .asInstanceOf[Any]))
  }
}
