package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.corpus.{Corpus, Html, Ingest}
import graft.index.{Deletes, IndexBuilder, IndexConfig, Snapshot}
import graft.search.{BoolQuery, IndexHandle, Searcher}
import graft.streaming.IndexStream

/** Streaming recrawl ingestion: micro-batches that RE-CAPTURE urls (the
  * case appendStream's contract excludes) flow through refreshBatch —
  * validate, latest-edition-per-url, upsert — with a batch-id ledger for
  * replay idempotence and deterministic crash resume. */
class RecrawlStreamSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = IndexConfig(numSegments = 4, blockSize = 16)

  private lazy val crawl0 = Corpus.pages(spark, 120, seed = 21,
    vocabSize = 300, medianLen = 30).collect().toSeq
  private lazy val crawl1 = {
    val recaptured = crawl0.zipWithIndex.collect { case (p, i) if i % 4 == 0 =>
      val newText = p.text + " zzrecrawl stream"
      p.copy(warc_ts = new Timestamp(p.warc_ts.getTime + 86400000L),
        html = Html.wrap(p.url, newText), text = newText)
    }
    recaptured ++ Corpus.pages(spark, 15, seed = 22, vocabSize = 300,
      medianLen = 30, startId = 9000).collect().toSeq
  }

  private def canon(hits: Array[graft.search.Hit]) =
    hits.map(h => (h.url, h.score)).sortBy { case (u, s) => (-s, u) }.toSeq

  test("streamed recrawl == batch build + refreshIndex over the same crawls") {
    val src = Files.createTempDirectory("graft-rs-src").toString
    def writeChunk(pages: Seq[graft.corpus.Page], i: Int): Unit = {
      val tmp = Files.createTempDirectory("graft-rs-chunk")
      pages.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      // the running file source polls src: stage the copy OUTSIDE it and
      // ATOMIC_MOVE into place so a half-copied parquet is never listed
      val staged = Files.copy(f,
        tmp.resolve(f"part-$i%03d.parquet"))
      Files.move(staged, java.nio.file.Paths.get(src, f"part-$i%03d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeChunk(crawl0, 0)
    val idxDir = Files.createTempDirectory("graft-rs-idx").toString
    val ckpt = Files.createTempDirectory("graft-rs-ckpt").toString
    val q = IndexStream.refreshStream(spark, src, idxDir, cfg, ckpt,
      maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      writeChunk(crawl1, 1)
      q.processAllAvailable()
    } finally q.stop()

    val snap = Snapshot.latest(idxDir).get
    assert(snap.isComplete)
    assert(snap.deletedDocs === crawl1.count(p => crawl0.exists(_.url == p.url)))

    // reference: batch build of crawl0 + Ingest.refreshIndex(crawl1)
    val refDir = Files.createTempDirectory("graft-rs-ref").toString
    IndexBuilder.build(spark, crawl0.toDF().select("url", "text"), refDir, cfg)
    Ingest.refreshIndex(spark, crawl1.toDF(), refDir)
    Seq("the data", "zzrecrawl", "merge sort").foreach { query =>
      val a = canon(Searcher.topK(spark, idxDir, query, 200))
      val b = canon(Searcher.topK(spark, refDir, query, 200))
      assert(a === b, s"stream vs batch drift: $query")
    }
  }

  test("cleared-but-same-path checkpoint restart still indexes fresh data") {
    // refreshStream's ledger lineage is the checkpoint's persistent query
    // id, NOT the path: clearing the checkpoint renumbers batches from 0,
    // and a path-string lineage would skip them as acknowledged replays —
    // silently dropping whatever fresh data landed in those batch ids
    val src = Files.createTempDirectory("graft-rs-clr-src").toString
    val ckpt = Files.createTempDirectory("graft-rs-clr-ckpt").toString
    val idxDir = Files.createTempDirectory("graft-rs-clr-idx").toString
    def writeChunk(pages: Seq[graft.corpus.Page], i: Int): Unit = {
      val tmp = Files.createTempDirectory("graft-rs-clr-chunk")
      pages.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val staged = Files.copy(f, tmp.resolve(f"part-$i%03d.parquet"))
      Files.move(staged, java.nio.file.Paths.get(src, f"part-$i%03d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def clearDir(p: java.nio.file.Path): Unit =
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .filter(_ != p).forEach(Files.delete(_))

    writeChunk(crawl0, 0)
    val q1 = IndexStream.refreshStream(spark, src, idxDir, cfg, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val lin1 = IndexStream.checkpointLineage(spark, ckpt)
    assert(lin1 !== ckpt, "lineage should be the query id, not the path")

    // operator clears the checkpoint (same path) to reprocess, and fresh
    // data arrives; the restarted stream's batch 0 covers BOTH chunks
    clearDir(java.nio.file.Paths.get(ckpt))
    val fresh = Corpus.pages(spark, 10, seed = 31, vocabSize = 300,
      medianLen = 30, startId = 7000).collect().toSeq
    writeChunk(fresh, 1)
    val q2 = IndexStream.refreshStream(spark, src, idxDir, cfg, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(IndexStream.checkpointLineage(spark, ckpt) !== lin1,
      "cleared checkpoint must mint a new lineage")
    // the fresh urls are indexed (a path-lineage ledger would have
    // skipped the renumbered batch 0 and dropped them)
    val h = new IndexHandle(spark, idxDir, warm = false)
    fresh.take(3).foreach { p =>
      assert(h.search(BoolQuery(ids = Some(Seq(p.url))), 2).nonEmpty,
        s"fresh url ${p.url} missing after cleared-checkpoint restart")
    }
  }

  test("incomplete generation + foreign lineage is refused, never mixed") {
    val idxDir = Files.createTempDirectory("graft-rs-foreign").toString
    IndexStream.refreshBatch(spark, idxDir, cfg)(crawl0.toDF(), 0L)
    // crash mid-append of batch 1 under the original lineage
    val processed = Ingest.prepareBatch(crawl1.toDF())
    IndexBuilder.append(spark, processed, idxDir,
      simulateOnlySegments = Some(Set(4, 5)))
    assert(!Snapshot.latest(idxDir).get.isComplete)
    // restart under a CLEARED checkpoint: new lineage, batch 0 = the whole
    // source — same-lineage evidence absent, content evidence fails (the
    // committed half-generation holds only crawl1's urls) -> loud refusal
    val e = intercept[IllegalStateException](
      IndexStream.refreshBatch(spark, idxDir, cfg,
        lineage = "fresh-ckpt")((crawl0 ++ crawl1).toDF(), 0L))
    assert(e.getMessage.contains("rollback"))
  }

  test("acknowledged replay is a no-op; crash mid-append resumes deterministically") {
    val idxDir = Files.createTempDirectory("graft-rs-replay").toString
    IndexStream.refreshBatch(spark, idxDir, cfg)(crawl0.toDF(), 0L)
    val s1 = Snapshot.latest(idxDir).get
    // replay of batch 0 (ledger has it) — nothing committed
    IndexStream.refreshBatch(spark, idxDir, cfg)(crawl0.toDF(), 0L)
    assert(Snapshot.latest(idxDir).get.id === s1.id)

    // crash scenario for batch 1: tombstones committed, append half-done
    val processed = Ingest.prepareBatch(crawl1.toDF())
    val h = new IndexHandle(spark, idxDir, warm = false)
    val dead = h.resolveDocIds(crawl1.map(_.url).filter(u =>
      crawl0.exists(_.url == u)))
    Deletes.deleteDocIds(spark, idxDir, dead)
    IndexBuilder.append(spark, processed, idxDir,
      simulateOnlySegments = Some(Set(4, 5))) // half the new generation
    assert(!Snapshot.latest(idxDir).get.isComplete)

    // restart replays batch 1: ledger says unapplied -> resume completes it
    IndexStream.refreshBatch(spark, idxDir, cfg)(crawl1.toDF(), 1L)
    val done = Snapshot.latest(idxDir).get
    assert(done.isComplete && done.generations === 2)
    assert(IndexStream.lastBatchId(idxDir, "manual") === 1L)

    // and the result equals a clean two-batch refresh
    val refDir = Files.createTempDirectory("graft-rs-replay-ref").toString
    IndexStream.refreshBatch(spark, refDir, cfg)(crawl0.toDF(), 0L)
    IndexStream.refreshBatch(spark, refDir, cfg)(crawl1.toDF(), 1L)
    Seq("the data", "zzrecrawl").foreach { query =>
      assert(canon(Searcher.topK(spark, idxDir, query, 200)) ===
        canon(Searcher.topK(spark, refDir, query, 200)), s"resume drift: $query")
    }
    // a recaptured url serves exactly its newest edition
    val u = crawl1.find(p => crawl0.exists(_.url == p.url)).get.url
    val hit = Searcher.search(spark, idxDir, BoolQuery(ids = Some(Seq(u))), 5)
    assert(hit.size === 1)

    // a NEW checkpoint lineage renumbers batches from 0 — its batch 0 must
    // APPLY (old lineage's ledger must not swallow fresh data); the
    // re-upsert of identical content is membership-safe, and the ledger
    // switches to the new lineage
    val before = Snapshot.latest(idxDir).get.id
    IndexStream.refreshBatch(spark, idxDir, cfg,
      lineage = "checkpoint-v2")(crawl1.toDF(), 0L)
    assert(Snapshot.latest(idxDir).get.id > before,
      "fresh lineage's batch must not be skipped")
    assert(IndexStream.lastBatchId(idxDir, "checkpoint-v2") === 0L)
    assert(IndexStream.lastBatchId(idxDir, "manual") === -1L)
    // membership is unchanged by the duplicate-generation re-apply
    assert(Searcher.search(spark, idxDir, BoolQuery(ids = Some(Seq(u))), 5)
      .size === 1)
  }

  test("same-lineage ledger does NOT bless a foreign crashed generation") {
    // lineage A ran before (ledger: A,0). A DIFFERENT-checkpoint stream B
    // then crashes mid-append of ITS batch — ledger unchanged. When A's
    // next batch arrives, a ledger-presence shortcut would let it complete
    // B's partial generation with foreign content (silent mixed-generation
    // corruption); resume safety must rest on content evidence ALWAYS.
    val idxDir = Files.createTempDirectory("graft-rs-foreign-ledger").toString
    IndexStream.refreshBatch(spark, idxDir, cfg,
      lineage = "ckpt-A")(crawl0.toDF(), 0L)
    assert(IndexStream.lastBatchId(idxDir, "ckpt-A") === 0L)
    // foreign stream B's half-appended batch (content A never saw)
    val foreign = Corpus.pages(spark, 40, seed = 77, vocabSize = 300,
      medianLen = 30, startId = 5000).collect().toSeq
    val processedB = Ingest.prepareBatch(foreign.toDF())
    IndexBuilder.append(spark, processedB, idxDir,
      simulateOnlySegments = Some(Set(4, 5)))
    assert(!Snapshot.latest(idxDir).get.isComplete)
    // lineage A replays/continues with ITS batch 1 — must be refused, not
    // grafted onto B's generation (ledger still says A,0 so batchId 1 is
    // unacknowledged)
    val e = intercept[IllegalStateException](
      IndexStream.refreshBatch(spark, idxDir, cfg,
        lineage = "ckpt-A")(crawl1.toDF(), 1L))
    assert(e.getMessage.contains("rollback"))
  }

  test("a batch emptied by lang scoping is acknowledged without committing") {
    val dir = Files.createTempDirectory("graft-rs-empty").toString
    IndexStream.refreshBatch(spark, dir, cfg, langs = Set("en"))(crawl0.toDF(), 0L)
    val s = Snapshot.latest(dir).get
    // batch of ONLY non-en rows: no commit, but the ledger advances
    val nonEn = crawl0.filter(_.lang != "en")
    assert(nonEn.nonEmpty)
    IndexStream.refreshBatch(spark, dir, cfg, langs = Set("en"))(nonEn.toDF(), 1L)
    assert(Snapshot.latest(dir).get.id === s.id, "no empty generation")
    assert(IndexStream.lastBatchId(dir, "manual") === 1L)
  }
}
