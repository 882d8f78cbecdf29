package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.corpus.Corpus
import graft.index.{Deletes, IndexBuilder, IndexConfig, PostingRow, Snapshot}
import graft.search.{BoolQuery, IndexHandle, OracleSearch, Searcher}

/** Format v2: per-segment url/doc-length marker tables are BLOCK-CHUNKED
  * (one row per IndexConfig.markerChunkDocs rank slots) so a segment is
  * never capped by the 2 GiB JVM-array ceiling of a single parquet cell
  * (~3×10⁷ urls at ~60 B/url, while the documented sizing range goes to
  * 10⁸ docs/segment). These tests force tiny chunks (7 slots) so every
  * reader crosses many chunk boundaries at spec scale, and pin full
  * result identity against a single-chunk build of the same corpus
  * through the whole lifecycle (search, served, ids, count, scan, upsert,
  * delete, purge, append, compact). */
class ChunkedMarkerSpec extends SparkSuite {
  import spark.implicits._

  private val P = 2
  private val cfgChunked =
    IndexConfig(numSegments = P, blockSize = 16, markerChunkDocs = 7)
  private val cfgMono =
    IndexConfig(numSegments = P, blockSize = 16, markerChunkDocs = 1 << 20)

  private lazy val pages = Corpus.pages(spark, 230, seed = 11,
    vocabSize = 300, medianLen = 40).cache()
  private lazy val docs: Seq[(String, String)] =
    pages.select("url", "text").as[(String, String)].collect().toSeq

  private def build(cfg: IndexConfig): String = {
    val dir = Files.createTempDirectory("graft-chunk").toString
    IndexBuilder.build(spark, pages.toDF(), dir, cfg)
    dir
  }
  private lazy val chunkedDir = build(cfgChunked)
  private lazy val monoDir = build(cfgMono)

  private def markerRows(dir: String, term: String): Seq[PostingRow] = {
    val snap = Snapshot.latest(dir).get
    spark.read.parquet(snap.dataDirs.map(d => s"$dir/$d"): _*)
      .as[PostingRow].filter(_.term == term).collect().toSeq
  }

  test("chunking invariant: non-final chunks hold exactly markerChunkDocs slots") {
    val urls = markerRows(chunkedDir, IndexBuilder.TermUrls)
    assert(urls.groupBy(_.segId).forall(_._2.size > 1), "chunking not exercised")
    urls.groupBy(_.segId).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.chunk)
      assert(sorted.map(_.chunk) === sorted.indices)
      sorted.dropRight(1).foreach(r => assert(r.df === 7L))
      assert(sorted.last.df <= 7L && sorted.last.df > 0L)
      // lens chunks align 1:1 with url chunks
    }
    val lens = markerRows(chunkedDir, IndexBuilder.TermLens)
    assert(lens.groupBy(_.segId).view.mapValues(_.map(_.chunk).sorted).toMap ===
      urls.groupBy(_.segId).view.mapValues(_.map(_.chunk).sorted).toMap)
  }

  test("snapshot stats are sums over chunk rows and match the mono build") {
    val a = Snapshot.latest(chunkedDir).get
    val b = Snapshot.latest(monoDir).get
    assert(a.numDocs === 230L)
    assert(a.numDocs === b.numDocs)
    assert(a.sumDocLen === b.sumDocLen)
    assert(a.markerChunkDocs === 7)
    assert(a.termdictRows > 0 && a.termdictRows === b.termdictRows)
    assert(a.formatVersion === Snapshot.CurrentFormat)
  }

  test("distributed, warm and served top-k are identical across chunkings") {
    val queries = Seq("the", "data merge", "w1x w2x w3x", "crawl")
    val warm = new IndexHandle(spark, chunkedDir, warm = true)
    try {
      queries.foreach { q =>
        val mono = Searcher.topK(spark, monoDir, q, 10)
          .map(h => (h.docId, h.url, h.score)).toSeq
        assert(Searcher.topK(spark, chunkedDir, q, 10)
          .map(h => (h.docId, h.url, h.score)).toSeq === mono, s"cold: $q")
        assert(warm.topK(q, 10).map(h => (h.docId, h.url, h.score)).toSeq
          === mono, s"warm: $q")
        assert(warm.servedTopK(q, 10).map(h => (h.docId, h.url, h.score)).toSeq
          === mono, s"served: $q")
      }
    } finally warm.close()
  }

  test("ids resolution crosses chunk boundaries (executor-side probe)") {
    // pick urls that land at ranks around the 7-slot boundaries: the url
    // table of each segment is sorted, so take a spread across positions
    val someUrls = docs.map(_._1).sorted.grouped(13).map(_.head).toSeq
    val q = BoolQuery(ids = Some(someUrls))
    val mono = Searcher.search(spark, monoDir, q, 50)
      .map(h => (h.docId, h.url, h.score)).toSeq
    val chunked = Searcher.search(spark, chunkedDir, q, 50)
      .map(h => (h.docId, h.url, h.score)).toSeq
    assert(chunked === mono)
    assert(chunked.nonEmpty)
  }

  test("count + scan enumeration identical across chunkings (lockstep walk)") {
    val qs = Seq(BoolQuery.text("the"), BoolQuery.text("data crawl"),
      BoolQuery(must = Seq("data"), mustNot = Seq("the")))
    qs.foreach { q =>
      assert(Searcher.count(spark, chunkedDir, q) ===
        Searcher.count(spark, monoDir, q))
      val a = Searcher.matches(spark, chunkedDir, q)
        .orderBy("docId").as[(Long, String, Int)].collect().toSeq
      val b = Searcher.matches(spark, monoDir, q)
        .orderBy("docId").as[(Long, String, Int)].collect().toSeq
      assert(a === b)
      assert(a.nonEmpty)
    }
  }

  test("upsert joins the chunked marker scan correctly (rank bases per chunk)") {
    // fresh dirs (upsert mutates)
    val dirA = build(cfgChunked)
    val dirB = build(cfgMono)
    // recrawl a spread of EXISTING urls with new content + some new urls
    val existing = docs.map(_._1).sorted.grouped(11).map(_.head).toSeq
    val batch = (existing.map(u => (u, "fresh recrawl content zz9")) ++
      Seq(("https://new.example/a", "fresh recrawl content zz9"))).toDF("url", "text")
    IndexBuilder.upsert(spark, batch, dirA)
    IndexBuilder.upsert(spark, batch, dirB)
    val qa = Searcher.topK(spark, dirA, "zz9", 50).map(h => h.url -> h.score).toSeq
    val qb = Searcher.topK(spark, dirB, "zz9", 50).map(h => h.url -> h.score).toSeq
    assert(qa === qb)
    assert(qa.map(_._1).toSet === (existing :+ "https://new.example/a").toSet)
    // old versions are tombstoned: an ids query returns only the new docs
    val ids = Searcher.search(spark, dirA, BoolQuery(ids = Some(existing)), 100)
    assert(ids.length === existing.size)
    assert(ids.forall(_.docId >= IndexBuilder.segBase(P))) // generation 1
  }

  test("delete + purge preserve chunk tables; scores match a fresh live build") {
    val dir = build(cfgChunked)
    val deadUrls = docs.map(_._1).sorted.grouped(9).map(_.head).toSet
    Deletes.delete(spark, dir, deadUrls.toSeq)
    Deletes.purge(spark, dir)
    val snap = Snapshot.latest(dir).get
    assert(snap.numDocs === (230 - deadUrls.size).toLong)
    // url chunk rows are preserved verbatim (slots never move)
    val urls = markerRows(dir, IndexBuilder.TermUrls)
    urls.groupBy(_.segId).foreach { case (_, rows) =>
      assert(rows.sortBy(_.chunk).dropRight(1).forall(_.df === 7L))
    }
    val live = docs.filterNot(d => deadUrls.contains(d._1))
    Seq("the", "data crawl", "w1x w5x").foreach { q =>
      val engine = Searcher.topK(spark, dir, q, 10)
      // purge makes stats live-only: (url, score) identical to a fresh
      // build over the live docs. docIds intentionally differ — dead rank
      // slots stay in the engine's tables so surviving docIds never move,
      // while a fresh build ranks the survivors compactly.
      val oracle = OracleSearch.topK(live, q, 10, P)
      assert(engine.map(h => (h.url, h.score)).toSeq ===
        oracle.map(h => (h.url, h.score)).toSeq, s"query: $q")
    }
  }

  test("append + compact keep chunk ordinals; results stay identical") {
    val dirA = build(cfgChunked)
    val extra = Corpus.pages(spark, 40, seed = 99, vocabSize = 300,
      medianLen = 40).toDF()
    IndexBuilder.append(spark, extra.select("url", "text"), dirA)
    val before = Searcher.topK(spark, dirA, "the data", 10)
      .map(h => (h.docId, h.url, h.score)).toSeq
    IndexBuilder.compact(spark, dirA)
    val after = Searcher.topK(spark, dirA, "the data", 10)
      .map(h => (h.docId, h.url, h.score)).toSeq
    assert(after === before)
  }

  test("format gate: a snapshot without formatVersion (v1 file) is refused loudly") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    IndexBuilder.build(spark, pages.toDF(), dir,
      IndexConfig(numSegments = 1, blockSize = 16))
    val snapFile = Paths.get(dir, "snapshots", "snap-00001.json")
    val json = Files.readString(snapFile)
    assert(json.contains("\"formatVersion\" : 2"))
    // simulate a pre-chunking (v1) snapshot file: no formatVersion field
    val v1 = json.replaceAll(",?\\s*\"formatVersion\"\\s*:\\s*2", "")
    Files.writeString(snapFile, v1)
    val e = intercept[IllegalStateException](Snapshot.latest(dir))
    assert(e.getMessage.contains("format"))
  }

  test("warm handle open issues no termdict-count job") {
    // differential, not a fixed ceiling: two byte-identical fresh copies
    // of the index, one with the persisted distinct-term count stripped
    // from its snapshot (termdictRows -> -1). The stripped copy's
    // admission gate must FALL BACK to a termdict.count() job — exactly
    // one job more than the warm open that reads the persisted count.
    // Asserting warmJobs < fallbackJobs self-calibrates against
    // AQE/listing job-count noise AND catches the regression a loose
    // absolute ceiling lets through: a gate reverted to count() directly
    // (without the fallback flag flipping) runs the count on BOTH sides
    // and the strict inequality fails.
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    def copyTree(src: String): String = {
      val dstRoot = Files.createTempDirectory("graft-chunk-copy")
      val s = Paths.get(src)
      Files.walk(s).forEach { p =>
        val t = dstRoot.resolve(s.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      }
      dstRoot.toString
    }
    // listener events are async — poll the counter to quiescence
    def jobsDuring(open: => IndexHandle): (Int, IndexHandle) = {
      Thread.sleep(300) // drain lingering events before arming
      val before = counter.get()
      val h = open
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val c = counter.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
      (counter.get() - before, h)
    }
    val dirA = copyTree(monoDir) // fresh paths: symmetric listing costs
    val dirB = copyTree(monoDir)
    val snapFile = Files.list(Paths.get(dirB, "snapshots")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("snap-"))
      .maxBy(_.getFileName.toString)
    val json = Files.readString(snapFile)
    assert(json.matches("(?s).*\"termdictRows\"\\s*:\\s*\\d+.*"),
      "expected a persisted termdictRows in the v2 snapshot")
    Files.writeString(snapFile,
      json.replaceAll("(\"termdictRows\"\\s*:\\s*)\\d+", "$1-1"))
    spark.sparkContext.addSparkListener(listener)
    try {
      val (warmJobs, hA) = jobsDuring(new IndexHandle(spark, dirA, warm = true))
      try {
        assert(!hA.usedTermdictCountFallback,
          "warm open fell back to a termdict.count() job - the persisted " +
            "snapshot count was not used")
        val (fbJobs, hB) = jobsDuring(new IndexHandle(spark, dirB, warm = true))
        try {
          assert(hB.usedTermdictCountFallback,
            "stripped snapshot must force the count() fallback")
          assert(warmJobs < fbJobs,
            s"warm open ran $warmJobs jobs vs $fbJobs on the count-less " +
              "copy - the persisted count saved no job")
        } finally hB.close()
      } finally hA.close()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("repeated ids lookups are job-free on a warm handle (per-url LRU)") {
    // first lookup pays the executor-side resolution job; the second —
    // same urls, including one ABSENT url (negative-cached against the
    // pinned snapshot) — must run zero Spark jobs
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    val h = new IndexHandle(spark, chunkedDir, warm = true)
    try {
      val probe = docs.map(_._1).sorted.grouped(17).map(_.head).toSeq :+
        "https://definitely-absent.example/x"
      val first = h.resolveDocIds(probe)
      assert(first.valuesIterator.map(_.length).sum === probe.size - 1)
      def quiesce(): Unit = {
        var last = -1; var stable = 0
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (stable < 3 && System.nanoTime() < deadline) {
          Thread.sleep(100)
          val c = counter.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        quiesce()
        val before = counter.get()
        val second = h.resolveDocIds(probe)
        quiesce()
        assert(counter.get() === before,
          "a repeated ids lookup ran a Spark job - the per-url LRU missed")
        assert(second.view.mapValues(_.toSeq).toMap ===
          first.view.mapValues(_.toSeq).toMap)
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally h.close()
  }

  test("empty segments still commit one chunk-0 marker pair") {
    val dir = Files.createTempDirectory("graft-empty").toString
    val two = pages.limit(2).toDF()
    IndexBuilder.build(spark, two.select("url", "text"), dir,
      IndexConfig(numSegments = 8, blockSize = 16, markerChunkDocs = 7))
    val snap = Snapshot.latest(dir).get
    assert(snap.isComplete)
    val urls = spark.read.parquet(snap.dataDirs.map(d => s"$dir/$d"): _*)
      .as[PostingRow].filter(_.term == IndexBuilder.TermUrls).collect()
    assert(urls.length === 8)
    assert(urls.forall(_.chunk === 0))
  }
}
