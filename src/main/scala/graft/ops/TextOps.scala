package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.index.Hashing

/** Text-analysis operators for training-data pipelines over a `(id, text)`
  * table: language-ID heuristic, quality features, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting. All hot paths
  * are built-in column functions (codegen); only the rolling hash is a UDF. */
object TextOps {

  /** Tiny per-language stopword lists for the n-gram/stopword-vote
    * heuristic. Deliberately small and pinned: the operator contract is
    * determinism, not linguistic accuracy. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Predicted language = argmax stopword hits (ties and zero-evidence ->
    * "und"); purely column-expression so it pushes into codegen. */
  def langIdExpr(tokens: Column): Column = {
    val counts = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(tokens,
        array(words.map(w => lit(w)): _*))) // distinct-presence vote
    }
    // argmax with deterministic tie -> "und" unless a strict winner exists
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val winners = counts.map { case (lang, c) =>
      when(c === best && best > 0, lit(lang))
    }
    val winnerCount = counts.map { case (_, c) =>
      when(c === best && best > 0, 1).otherwise(0)
    }.reduce(_ + _)
    when(winnerCount === 1, coalesce(winners: _*)).otherwise(lit("und"))
  }

  /** Quality features per document (length/diversity ratios). */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(
      col(idCol),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6)
        .as("type_token_ratio"),
      round((length(col(textCol)) - size(toks) + 1).cast("double") / size(toks), 6)
        .as("avg_token_len"),
      octet_length(col(textCol)).as("n_bytes"))
  }

  /** Bag-of-words content fingerprint: md5 of the sorted distinct
    * whitespace-token set (the ES built-in `fingerprint` ANALYZER shape —
    * standard-tokenize, sort, dedup, join — applied per document for
    * near-dup detection; oracled as q12). NOT the reference's
    * "onechunk" keyword chain, which never splits — that lives at
    * Analyzer.fingerprint. */
  def fingerprintExpr(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(textCol), " ")))))

  /** Polynomial rolling hash of the whole document (Rabin-Karp style),
    * for cheap content fingerprinting/shift-resistant chunking. */
  def rollingHash(text: String, window: Int = 16): Long = {
    // hash of every `window`-byte chunk folded with xor-rotate; pure Scala
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length == 0) return 0L
    var acc = 0L
    var h = 0L
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < math.min(window, bytes.length)) { pow *= B; i += 1 }
    i = 0
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xff)
      if (i >= window) h -= pow * (bytes(i - window) & 0xff)
      if (i >= window - 1) acc ^= java.lang.Long.rotateLeft(h, i % 64)
      i += 1
    }
    // sub-window texts never fire the fold above — fold the partial-window
    // hash so short documents don't all collapse to fingerprint 0
    if (bytes.length < window)
      acc = java.lang.Long.rotateLeft(h, (bytes.length - 1) % 64)
    acc
  }

  val rollingHashUdf = udf((text: String) =>
    rollingHash(if (text == null) "" else text))

  val simhashHexUdf = udf((text: String) => f"${Dedup.simhash64(text)}%016x")
}
