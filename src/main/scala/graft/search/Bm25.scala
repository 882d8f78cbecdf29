package graft.search

/** BM25 scoring exactly as Elasticsearch 7.4's default similarity — the
  * reference never overrides `similarity` in any settings file and pins
  * ES 7.4.0 (reference: docker-compose.yml:5), so:
  *
  *   idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfNorm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  *   score  = idf * tfNorm,  k1 = 1.2, b = 0.75
  *
  * Rank-identical floats across the distributed engine and the exhaustive
  * oracle are guaranteed by (a) this single shared implementation, (b) doc
  * scores accumulating per-term contributions in ascending term order, and
  * (c) avgdl derived from exact integer (N, sumDocLen) rather than a
  * float average whose reduction order could vary with parallelism.
  */
object Bm25 extends Serializable {
  val K1 = 1.2
  val B = 0.75

  def idf(numDocs: Long, df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  def avgdl(numDocs: Long, sumDocLen: Long): Double =
    sumDocLen.toDouble / numDocs.toDouble

  /** tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) */
  def tfNorm(tf: Int, docLen: Int, avgDocLen: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * docLen / avgDocLen))

  def score(tf: Int, docLen: Int, avgDocLen: Double, numDocs: Long, df: Long): Double =
    idf(numDocs, df) * tfNorm(tf, docLen, avgDocLen)

  /** Upper bound of tfNorm as tf -> inf for a given docLen (used for
    * block-max metadata sanity; actual blocks store the observed max). */
  def tfNormUpperBound: Double = K1 + 1.0
}
