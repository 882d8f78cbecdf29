package graft

import java.nio.file.Files

import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.{Deletes, Hashing, IndexBuilder, IndexConfig, Snapshot}
import graft.search.{BoolQuery, IndexHandle, Searcher}

/** Recrawl lifecycle: `IndexBuilder.upsert` (tombstone old version + append
  * new generation, latest wins) and snapshot time travel (a handle pinned
  * to a pre-upsert snapshot id still answers from the old state). */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = IndexConfig(numSegments = 4, blockSize = 16)
  private lazy val pages = Corpus.pages(spark, 200, seed = 11,
    vocabSize = 400, medianLen = 40).cache()
  private lazy val docs: Seq[(String, String)] =
    pages.select("url", "text").as[(String, String)].collect().toSeq

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft-ups").toString
    IndexBuilder.build(spark, pages.toDF(), dir, cfg)
    dir
  }

  // every 5th doc gets recrawled with fresh text carrying a marker token
  private def recrawl: Seq[(String, String)] = docs.zipWithIndex
    .collect { case ((url, text), i) if i % 5 == 0 =>
      (url, text + " zzrecrawled fresh tokens") }

  test("upsert candidate segments stay batch-bounded as the index grows") {
    // the regression guard for streaming-upsert flatness: the marker scan
    // reads exactly |distinct s0(batch urls)| x generations segments —
    // O(batch x generations), NEVER O(index). Timing lives in
    // tools/UpsertFlatProbe; this pins the count formula.
    val dir = freshIndex()
    val batchUrls = docs.take(7).map(_._1)
    val batch = batchUrls.map(u => (u, "probe text")).toDF("url", "text")
    Seq(1, 2, 4).foreach { gens =>
      while (Snapshot.latest(dir).get.generations < gens) {
        val g = Snapshot.latest(dir).get.generations
        val extra = Corpus.pages(spark, 60, seed = 11, vocabSize = 400,
          medianLen = 40, startId = 1000L * g).select("url", "text").toDF()
        IndexBuilder.append(spark, extra, dir)
      }
      val snap = Snapshot.latest(dir).get
      assert(snap.generations === gens)
      val cand = IndexBuilder.upsertCandidateSegs(batch, snap)
      val s0 = batchUrls.map(u =>
        graft.index.Hashing.segmentOf(u, cfg.numSegments)).distinct.sorted
      assert(cand.sorted === s0.flatMap(x =>
        (0 until gens).map(_ * cfg.numSegments + x)).sorted)
      assert(cand.size === s0.size * gens)
      assert(cand.size <= batchUrls.size * gens) // batch-bounded, not index
    }
  }

  test("upsert: latest version wins for search and ids; stats keep old versions") {
    val dir = freshIndex()
    val snap = IndexBuilder.upsert(spark, recrawl.toDF("url", "text"), dir)
    assert(snap.generations === 2)
    assert(snap.deletedDocs === recrawl.size)
    // N/avgdl count old + new versions until purge (ES/Lucene semantics)
    assert(snap.numDocs === docs.size + recrawl.size)

    // the marker term matches exactly the recrawled urls — via their NEW docIds
    val hits = Searcher.search(spark, dir,
      BoolQuery(must = Seq("zzrecrawled")), docs.size)
    assert(hits.map(_.url).toSet === recrawl.map(_._1).toSet)
    assert(hits.forall(h => (h.docId >> IndexBuilder.SegShift) >= cfg.numSegments),
      "matches must come from the appended generation")

    // an ids lookup of a recrawled url resolves to exactly its live version
    val h = new IndexHandle(spark, dir, warm = false)
    val u = recrawl.head._1
    val idHits = h.search(BoolQuery(ids = Some(Seq(u))), 10)
    assert(idHits.map(_.url).toSeq === Seq(u))
    assert((idHits.head.docId >> IndexBuilder.SegShift) >= cfg.numSegments)
  }

  test("upsert marker scan is batch-bounded: candidate segments only") {
    val dir = freshIndex()
    // grow to 3 generations so the candidate set must span generations
    IndexBuilder.upsert(spark, recrawl.toDF("url", "text"), dir)
    val snap = Snapshot.latest(dir).get
    assert(snap.generations === 2)
    // a single-url batch: candidates = {g*P + murmur3(url) mod P} exactly
    val u = recrawl.head._1
    val batch = Seq((u, "one fresh doc")).toDF("url", "text")
    val cands = IndexBuilder.upsertCandidateSegs(batch, snap)
    val s0 = graft.index.Hashing.segmentOf(u, cfg.numSegments)
    assert(cands === (0 until snap.generations).map(_ * cfg.numSegments + s0))
    // the scan's pushed parquet filters carry the candidate prune (the scan
    // reads O(batch) segments, not the whole index)
    val planStr = IndexBuilder.upsertMarkerScan(spark, dir, snap, cands)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(planStr.contains("In(segId"), s"segId pushdown missing:\n$planStr")
    // and the scan's OUTPUT rows come from candidate segments only
    val segsTouched = IndexBuilder.upsertMarkerScan(spark, dir, snap, cands)
      .select("segId").distinct().collect().map(_.getInt(0)).toSet
    assert(segsTouched.subsetOf(cands.toSet))
    // end-to-end: the pruned upsert behaves identically (third version wins)
    val after = IndexBuilder.upsert(spark, batch, dir)
    assert(after.generations === 3)
    val hits = Searcher.search(spark, dir, BoolQuery(ids = Some(Seq(u))), 10)
    assert(hits.map(_.url).toSeq === Seq(u))
    assert((hits.head.docId >> IndexBuilder.SegShift) >= 2 * cfg.numSegments)
  }

  test("upsert of never-seen urls == plain append (no tombstone commit)") {
    val dir = freshIndex()
    val before = Snapshot.latest(dir).get
    val newDocs = Corpus.pages(spark, 30, seed = 77, vocabSize = 400,
      medianLen = 40, startId = 1000)
    val snap = IndexBuilder.upsert(spark, newDocs.select("url", "text"), dir)
    assert(snap.deletedDocs === 0L)
    assert(snap.id === before.id + 1, "exactly one commit: the append")
    assert(snap.numDocs === docs.size + 30)
  }

  test("upsert + purge == fresh build over the final corpus") {
    val dir = freshIndex()
    IndexBuilder.upsert(spark, recrawl.toDF("url", "text"), dir)
    val purged = Deletes.purge(spark, dir)
    assert(purged.deletedDocs === 0L)
    assert(purged.numDocs === docs.size)

    val replaced = recrawl.map(_._1).toSet
    val finalCorpus = docs.filterNot(d => replaced.contains(d._1)) ++ recrawl
    val freshDir = Files.createTempDirectory("graft-ups-fresh").toString
    IndexBuilder.build(spark, finalCorpus.toDF("url", "text"), freshDir, cfg)
    Seq("the data", "zzrecrawled", "merge sort join", "fresh tokens").foreach { q =>
      val a = Searcher.topK(spark, dir, q, 10).map(h => (h.url, h.score)).toSeq
      val b = Searcher.topK(spark, freshDir, q, 10).map(h => (h.url, h.score)).toSeq
      assert(a === b, s"purged-upsert vs fresh drift for: $q")
    }
  }

  test("second upsert of the same url replaces again (three versions, one live)") {
    val dir = freshIndex()
    val u = docs.head._1
    IndexBuilder.upsert(spark, Seq((u, "version two alpha")).toDF("url", "text"), dir)
    val snap = IndexBuilder.upsert(spark,
      Seq((u, "version three omega")).toDF("url", "text"), dir)
    assert(snap.generations === 3)
    assert(snap.deletedDocs === 2L) // v1 and v2 both dead
    assert(Searcher.search(spark, dir, BoolQuery(must = Seq("alpha")), 5).isEmpty)
    val hits = Searcher.search(spark, dir, BoolQuery(must = Seq("omega")), 5)
    assert(hits.map(_.url).toSeq === Seq(u))
    val idHits = Searcher.search(spark, dir, BoolQuery(ids = Some(Seq(u))), 5)
    assert(idHits.size === 1 && idHits.head.url === u)
  }

  test("time travel: a pinned snapshot answers from the pre-upsert state") {
    val dir = freshIndex()
    val v1 = Snapshot.latest(dir).get
    IndexBuilder.upsert(spark, recrawl.toDF("url", "text"), dir)

    val pinned = new IndexHandle(spark, dir, warm = false, snapshotId = Some(v1.id))
    try {
      assert(pinned.snap.id === v1.id)
      assert(pinned.snap.numDocs === docs.size)
      // the recrawl never happened in this snapshot
      assert(pinned.search(BoolQuery(must = Seq("zzrecrawled")), 10).isEmpty)
      // and the old version of a recrawled doc is still its live one
      val u = recrawl.head._1
      assert(pinned.search(BoolQuery(ids = Some(Seq(u))), 5)
        .map(_.url).toSeq === Seq(u))
    } finally pinned.close()

    // history chain is enumerable and parent-linked
    val snaps = Snapshot.list(dir)
    assert(snaps.map(_.id) === snaps.map(_.id).sorted)
    assert(snaps.size >= 3) // build, tombstone, append
    snaps.sliding(2).foreach { case Seq(a, b) => assert(b.parent === a.id) }

    // the same url resolves to DIFFERENT docIds in the two snapshots: the
    // pinned reader serves the generation-0 version, LATEST the appended one
    val latest = new IndexHandle(spark, dir, warm = false)
    try {
      val u = recrawl.head._1
      val pinnedAgain = new IndexHandle(spark, dir, warm = false,
        snapshotId = Some(v1.id))
      try {
        val oldId = pinnedAgain.search(BoolQuery(ids = Some(Seq(u))), 5).head.docId
        val newId = latest.search(BoolQuery(ids = Some(Seq(u))), 5).head.docId
        assert((oldId >> IndexBuilder.SegShift) < cfg.numSegments,
          "pinned snapshot must serve the generation-0 version")
        assert((newId >> IndexBuilder.SegShift) >= cfg.numSegments,
          "LATEST must serve the appended-generation version")
        assert(oldId !== newId)
      } finally pinnedAgain.close()
      val marker = Searcher.search(spark, dir, BoolQuery(must = Seq("zzrecrawled")), 5)
      assert(marker.nonEmpty)
    } finally latest.close()
  }
}
