package graft

import java.security.MessageDigest

import graft.corpus.{Corpus, Html}

/** The per-url byte-identical extraction invariant (north rule) plus
  * generation determinism across partition counts. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("extract(wrap(text)) is byte-identical, including entities") {
    val texts = Seq("plain words", "a < b && c > d", "ampers&nd <article> fake",
      "", "unicode — déjà vu 中文")
    texts.foreach { t =>
      assert(Html.extract(Html.wrap("https://u", t)) === t)
    }
  }

  test("every generated page satisfies extract(html) == text") {
    val pages = Corpus.pages(spark, 300, seed = 42).collect()
    pages.foreach { p =>
      assert(Html.extract(p.html) === p.text, s"url=${p.url}")
    }
  }

  test("generation is a pure function of (seed, id): partitioning-proof") {
    val a = Corpus.pages(spark, 200, seed = 42, numPartitions = 2)
      .collect().sortBy(_.url)
    val b = Corpus.pages(spark, 200, seed = 42, numPartitions = 7)
      .collect().sortBy(_.url)
    assert(a.map(_.url).toSeq === b.map(_.url).toSeq)
    assert(a.map(p => sha256(p.text)).toSeq === b.map(p => sha256(p.text)).toSeq)
    assert(a.map(_.lang).toSeq === b.map(_.lang).toSeq)
    assert(a.map(_.warc_ts.getTime).toSeq === b.map(_.warc_ts.getTime).toSeq)
  }

  test("golden SHA-256 of first pages is pinned across releases") {
    // HARD-CODED literals (pinned 2026-08-18): the previous version
    // recomputed the "goldens" from the current run and compared the
    // generator against itself — structurally unable to detect drift.
    // Any change to the generator or extractor chain must be deliberate
    // and update these constants.
    val golden = Map(
      "https://example0.org/p/0" ->
        "7c4fb8f9c0374c358e7865be79b51b47b95d6dab71d04b53d7e37419afa07e22",
      "https://example522.org/p/2" ->
        "c28632f0b0e90211ddf253bff4f1e17e3d9a6623559656a7e8cb2e08c79ee5fb",
      "https://example761.org/p/1" ->
        "16bf264bba62cc8f11c4605f14dc18fe353f31e8115c2082eead615d362f6f5b")
    val byId = Corpus.pages(spark, 3, seed = 42).collect().sortBy(_.url)
    assert(byId.map(_.url).toSet === golden.keySet)
    byId.foreach(p => assert(sha256(p.text) === golden(p.url), p.url))
  }

  test("head-term skew exists: top term reaches >30% of documents") {
    val pages = Corpus.pages(spark, 400, seed = 42).cache()
    val n = pages.count()
    val topDf = pages
      .flatMap(p => graft.analysis.Analyzer.tokenize(p.text).distinct)
      .groupByKey(identity).count()
      .orderBy($"count(1)".desc)
      .head()._2
    assert(topDf.toDouble / n > 0.3, s"top df=$topDf of $n")
  }
}
