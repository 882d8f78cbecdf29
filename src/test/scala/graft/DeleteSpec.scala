package graft

import java.nio.file.Files

import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.{Deletes, IndexBuilder, IndexConfig, Snapshot}
import graft.search.{BoolQuery, IndexHandle, OracleSearch, Searcher}

/** Delete lifecycle: tombstones (soft deletes, ES/Lucene semantics — docs
  * vanish from results, stats keep counting them) and purge (expunge merge
  * — post-purge results score-identical to a fresh build over live docs,
  * docIds of survivors unchanged). */
class DeleteSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = IndexConfig(numSegments = 6, blockSize = 16)
  private lazy val pages = Corpus.pages(spark, 400, seed = 7,
    vocabSize = 500, medianLen = 50).cache()
  private lazy val docs: Seq[(String, String)] =
    pages.select("url", "text").as[(String, String)].collect().toSeq

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft-del").toString
    IndexBuilder.build(spark, pages.toDF(), dir, cfg)
    dir
  }

  private val queries = Seq("the data", "merge sort join", "crawl web page",
    "data spark segment", "the")

  private def urlsContaining(term: String, in: Seq[(String, String)] = docs): Set[String] =
    in.filter(d => Analyzer.termFreqs(d._2).contains(term)).map(_._1).toSet

  test("tombstoned docs vanish from results; stats still include them") {
    val dir = freshIndex()
    val deleted = docs.map(_._1).zipWithIndex
      .filter(_._2 % 7 == 0).map(_._1).toSet
    val snap = Deletes.delete(spark, dir, deleted.toSeq)
    assert(snap.deletedDocs === deleted.size)
    assert(snap.numDocs === docs.size) // N/avgdl unchanged until purge
    queries.foreach { q =>
      val engine = Searcher.topK(spark, dir, q, 10)
      val oracle = OracleSearch.topK(docs, q, 10, cfg.numSegments, deleted)
      assert(engine.map(h => (h.docId, h.url, h.score)).toSeq ===
        oracle.map(h => (h.docId, h.url, h.score)).toSeq, s"query: $q")
      assert(engine.forall(h => !deleted.contains(h.url)))
    }
    // re-deleting dead docs is a no-op commit-wise
    val again = Deletes.delete(spark, dir, deleted.take(5).toSeq)
    assert(again.id === snap.id)
  }

  test("track_total_hits: count is live-doc exact and shrinks with deletes") {
    val dir = freshIndex()
    val q = BoolQuery(filter = Seq("data"))
    val matching = urlsContaining("data")
    assert(Searcher.count(spark, dir, q) === matching.size.toLong)
    val victims = matching.toSeq.sorted.take(3)
    Deletes.delete(spark, dir, victims)
    assert(Searcher.count(spark, dir, q) === (matching.size - 3).toLong)
    // the scan-with-query enumeration honors the same tombstones
    val scanned = Searcher.matches(spark, dir, q)
      .select("url").collect().map(_.getString(0)).toSet
    assert(scanned === matching -- victims)
  }

  test("warm and served paths honor tombstones; ids of a deleted url gone") {
    val dir = freshIndex()
    val deleted = docs.map(_._1).take(40).toSet
    Deletes.delete(spark, dir, deleted.toSeq)
    val h = new IndexHandle(spark, dir, warm = true)
    try {
      queries.foreach { q =>
        val oracle = OracleSearch.topK(docs, q, 10, cfg.numSegments, deleted)
        assert(h.topK(q, 10).map(x => (x.docId, x.score)).toSeq ===
          oracle.map(x => (x.docId, x.score)).toSeq, s"warm: $q")
        assert(h.servedTopK(q, 10).map(x => (x.docId, x.score)).toSeq ===
          oracle.map(x => (x.docId, x.score)).toSeq, s"served: $q")
      }
      val dead = deleted.head
      val live = docs.map(_._1).find(u => !deleted.contains(u)).get
      val hits = h.search(BoolQuery(ids = Some(Seq(dead, live))), 10)
      assert(hits.map(_.url).toSeq === Seq(live))
      assert(h.servedSearch(BoolQuery(ids = Some(Seq(dead))), 10).isEmpty)
    } finally h.close()
  }

  test("delete-by-query tombstones exactly the matching docs, idempotent") {
    val dir = freshIndex()
    val matching = urlsContaining("data")
    assert(matching.nonEmpty && matching.size < docs.size)
    val s1 = Deletes.deleteByQuery(spark, dir, BoolQuery(filter = Seq("data")))
    assert(s1.deletedDocs === matching.size)
    // matching runs through the tombstone-aware search: second call no-ops
    val s2 = Deletes.deleteByQuery(spark, dir, BoolQuery(filter = Seq("data")))
    assert(s2.id === s1.id)
    assert(Searcher.search(spark, dir, BoolQuery(must = Seq("data")), 10).isEmpty)
  }

  test("delete-by-query enumerates distributed: broad match, no driver collect") {
    val dir = freshIndex()
    // prior tombstones first — the consolidated row must merge them
    val priorDead = docs.map(_._1).take(25).toSet
    Deletes.delete(spark, dir, priorDead.toSeq)
    // a near-universal pure-should match ("the" hits almost every doc) —
    // the old top-k-collect path; now enumerated per segment
    val h = new IndexHandle(spark, dir, warm = false)
    val plan = h.matchTombstoneRows(BoolQuery(should = Seq("the")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("CollectLimit"),
      s"match enumeration must not rank/collect:\n$plan")
    val matching = urlsContaining("the").diff(priorDead)
    val s1 = Deletes.deleteByQuery(spark, dir, BoolQuery(should = Seq("the")))
    assert(s1.deletedDocs === priorDead.size + matching.size)
    assert(Searcher.search(spark, dir, BoolQuery(must = Seq("the")), 10).isEmpty)
    // survivors behave exactly like the oracle with both delete sets applied
    val allDead = priorDead ++ matching
    queries.foreach { q =>
      val engine = Searcher.topK(spark, dir, q, 10)
      val oracle = OracleSearch.topK(docs, q, 10, cfg.numSegments, allDead)
      assert(engine.map(x => (x.docId, x.score)).toSeq ===
        oracle.map(x => (x.docId, x.score)).toSeq, s"query: $q")
    }
    // idempotent: the same broad delete commits nothing new
    assert(Deletes.deleteByQuery(spark, dir, BoolQuery(should = Seq("the"))).id
      === s1.id)
    // pure-ids delete through the enumeration sink (TermLens group anchor)
    // — fresh index: the broad delete above may have killed every doc
    val dir2 = freshIndex()
    val targets = docs.map(_._1).take(3)
    val s2 = Deletes.deleteByQuery(spark, dir2, BoolQuery(ids = Some(targets)))
    assert(s2.deletedDocs === targets.size)
    assert(Searcher.search(spark, dir2, BoolQuery(ids = Some(targets)), 10).isEmpty)
  }

  test("tombstone-volume pressure: 10^6 ids/segment consolidates in bounded time") {
    // deleteDocIds consolidates PRIOR tombstones of the affected segments
    // executor-side, streaming over encoded bytes (bounded by tombstone
    // bytes per task — purge is the pressure valve). Pin that bound with
    // measured numbers: 4 segments x 10^6 ids, then a second overlapping
    // mass delete that must merge against the full prior volume. (Ids need
    // not resolve to live docs — tombstones are exclusion cursors,
    // encoding is what is under test.)
    val dir = freshIndex()
    val perSeg = 1000000
    def ids(seg: Int, offset: Int): Array[Long] =
      Array.tabulate(perSeg)(i => IndexBuilder.segBase(seg) + offset + i + 1)
    val wave1 = (0 until 4).map(s => s -> ids(s, 0)).toMap
    val t0 = System.nanoTime()
    val s1 = Deletes.deleteDocIds(spark, dir, wave1)
    val d1 = (System.nanoTime() - t0) / 1e9
    assert(s1.deletedDocs === 4L * perSeg)
    // second wave overlaps half of wave 1 per segment
    val wave2 = (0 until 4).map(s => s -> ids(s, perSeg / 2)).toMap
    val t1 = System.nanoTime()
    val s2 = Deletes.deleteDocIds(spark, dir, wave2)
    val d2 = (System.nanoTime() - t1) / 1e9
    assert(s2.deletedDocs === 4L * perSeg + 4L * (perSeg / 2))
    info(f"wave1 (4M fresh ids): $d1%.1f s; wave2 (4M ids vs 4M prior): $d2%.1f s")
    // driver consolidation of ~10^6/segment must stay interactive-scale
    assert(d1 < 120 && d2 < 120, f"consolidation too slow: $d1%.1f / $d2%.1f s")
  }

  test("purge == fresh build over live docs (urls + bit-identical scores)") {
    val dir = freshIndex()
    val matching = urlsContaining("data")
    Deletes.deleteByQuery(spark, dir, BoolQuery(filter = Seq("data")))
    val purged = Deletes.purge(spark, dir)
    assert(purged.deletedDocs === 0L)
    assert(purged.numDocs === docs.size - matching.size)
    assert(purged.dataDirs.size === 1)

    val live = docs.filterNot(d => matching.contains(d._1))
    val freshDir = Files.createTempDirectory("graft-del-fresh").toString
    IndexBuilder.build(spark, live.toDF("url", "text"), freshDir, cfg)
    queries.foreach { q =>
      val a = Searcher.topK(spark, dir, q, 10).map(h => (h.url, h.score)).toSeq
      val b = Searcher.topK(spark, freshDir, q, 10).map(h => (h.url, h.score)).toSeq
      assert(a === b, s"purged vs fresh drift for: $q")
    }
    // purged urls stay dead for ids lookups (rank slots are tombstoned)
    val deadUrl = matching.head
    assert(Searcher.search(spark, dir,
      BoolQuery(ids = Some(Seq(deadUrl))), 10).isEmpty)
  }

  test("second delete+purge cycle stays exact (dead slots never revive)") {
    val dir = freshIndex()
    Deletes.deleteByQuery(spark, dir, BoolQuery(filter = Seq("data")))
    Deletes.purge(spark, dir)
    val live1 = docs.filterNot(d => urlsContaining("data").contains(d._1))

    val matching2 = urlsContaining("merge", live1)
    assert(matching2.nonEmpty)
    val s = Deletes.deleteByQuery(spark, dir, BoolQuery(filter = Seq("merge")))
    assert(s.deletedDocs === matching2.size)
    val purged2 = Deletes.purge(spark, dir)
    val live2 = live1.filterNot(d => matching2.contains(d._1))
    assert(purged2.numDocs === live2.size)

    val freshDir = Files.createTempDirectory("graft-del-fresh2").toString
    IndexBuilder.build(spark, live2.toDF("url", "text"), freshDir, cfg)
    queries.foreach { q =>
      val a = Searcher.topK(spark, dir, q, 10).map(h => (h.url, h.score)).toSeq
      val b = Searcher.topK(spark, freshDir, q, 10).map(h => (h.url, h.score)).toSeq
      assert(a === b, s"cycle-2 purged vs fresh drift for: $q")
    }
  }

  test("compact carries tombstones; vacuum reclaims pre-purge dirs") {
    val dir = freshIndex()
    val deleted = docs.map(_._1).take(30).toSet
    Deletes.delete(spark, dir, deleted.toSeq)
    IndexBuilder.compact(spark, dir)
    val oracle = OracleSearch.topK(docs, "the data", 10, cfg.numSegments, deleted)
    assert(Searcher.topK(spark, dir, "the data", 10)
      .map(h => (h.docId, h.score)).toSeq ===
      oracle.map(h => (h.docId, h.score)).toSeq)

    Deletes.purge(spark, dir)
    val removed = IndexBuilder.vacuum(dir)
    assert(removed.nonEmpty)
    val live = docs.filterNot(d => deleted.contains(d._1))
    val hits = Searcher.topK(spark, dir, "the data", 10)
    assert(hits.nonEmpty && hits.forall(h => !deleted.contains(h.url)))
    assert(Snapshot.latest(dir).get.numDocs === live.size)
  }

  test("deletes across appended generations") {
    val dir = Files.createTempDirectory("graft-del-gen").toString
    val batchA = Corpus.pages(spark, 250, seed = 7, vocabSize = 500, medianLen = 50)
    val batchB = Corpus.pages(spark, 150, seed = 99, vocabSize = 500,
      medianLen = 50, startId = 250)
    IndexBuilder.build(spark, batchA.toDF(), dir, cfg)
    IndexBuilder.append(spark, batchB.toDF(), dir)
    val all = batchA.union(batchB).select("url", "text")
      .as[(String, String)].collect().toSeq
    val deleted = (batchA.select("url").as[String].take(10) ++
      batchB.select("url").as[String].take(10)).toSet
    val snap = Deletes.delete(spark, dir, deleted.toSeq)
    assert(snap.deletedDocs === deleted.size)
    val hits = Searcher.topK(spark, dir, "the data", 20)
    assert(hits.nonEmpty && hits.forall(h => !deleted.contains(h.url)))

    val purged = Deletes.purge(spark, dir)
    assert(purged.numDocs === all.size - deleted.size)
    assert(Searcher.search(spark, dir,
      BoolQuery(ids = Some(deleted.toSeq)), 30).isEmpty)
    val live = all.filterNot(d => deleted.contains(d._1))
    val liveUrl = live.head._1
    assert(Searcher.search(spark, dir,
      BoolQuery(ids = Some(Seq(liveUrl))), 10).map(_.url).toSeq === Seq(liveUrl))
  }
}
