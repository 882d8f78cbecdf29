package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.tools.BenchHarness.timed
import graft.index.{IndexBuilder, IndexConfig, PostingRow, Snapshot}
import graft.search.{Bm25, BoolQuery, IndexHandle, Searcher}

/** Upper-segment-size evidence for the block-chunked marker tables (format
  * v2): build >= 5x10^7 documents into ONE segment — past the ~3x10^7-url /
  * 2 GiB JVM-array ceiling a monolithic per-segment url cell had — and
  * verify query results byte-identically against CLOSED-FORM expectations
  * (every document is a pure arithmetic function of its row id, so counts,
  * docIds, urls and BM25 scores are all computable driver-side without an
  * exhaustive oracle pass).
  *
  * Checks:
  *  - exact countMatches for four planted token classes (incl. a
  *    conjunction matching 6 docs out of 5x10^7)
  *  - matchesDF for the "edge" token planted ONLY at marker-chunk boundary
  *    ranks — the rank-lockstep walk must cross/skip every chunk seam and
  *    return the exact boundary urls
  *  - bit-identical BM25 scores + docIds for a tf-stratified query (the
  *    expected score is computed from closed-form df/avgdl via the same
  *    Bm25 object the engine uses; the smoke pins the encode/decode and
  *    stats plumbing at scale, formula identity is pinned by the oracle
  *    specs)
  *  - search_after page stitching across the giant segment
  *  - max marker cell size stays ~chunk-sized (vs a ~3.2 GB monolithic
  *    cell, which would throw before this tool could even commit)
  *
  * Usage: runMain graft.tools.OneSegSmoke [docs]  (default 5x10^7; urls are
  * ~64 B so the url table totals ~3.2 GB per 5x10^7 docs — deliberately
  * ABOVE the old one-cell format's hard cap). One JSON line on stdout.
  * Driver memory: SPARK_DRIVER_MEM=32g recommended at the default size. */
object OneSegSmoke {

  private val ChunkDocs = 1 << 20

  def url(i: Long): String =
    f"https://one.seg/section/subsection/archive-2024/item-area/d$i%09d/index.html"

  // token classes, all pure functions of i
  private def isNeedle(i: Long) = i % 1000 == 0
  private def isRare(i: Long) = i % 9973 == 0
  private def isEdge(i: Long) =
    (i % ChunkDocs == 0 && i > 0) || i % ChunkDocs == ChunkDocs - 1
  private def varyTf(i: Long): Int = (i % 8).toInt

  def text(i: Long): String = {
    val sb = new StringBuilder(96)
    sb.append("filler alpha beta")
    var v = varyTf(i)
    while (v > 0) { sb.append(" vary"); v -= 1 }
    if (isNeedle(i)) sb.append(" needle")
    if (isRare(i)) sb.append(" rare")
    if (isEdge(i)) sb.append(" edge")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val docs = args.headOption.map(_.toLong).getOrElse(50000000L)
    require(docs % 8 == 0, "docs must be a multiple of 8 (closed-form sumdl)")
    // above 1e9 the %09d-padded urls stop sorting numerically, so rank != i
    // and every closed-form check below would fail while IMPLICATING the
    // engine (same spurious-failure guard as PurgeSmoke)
    require(docs >= 10000 && docs <= 1000000000L,
      "docs must be in [1e4, 1e9]: url padding is 9 digits")
    val base = sys.env.getOrElse("GRAFT_SMOKE_TMP",
      BenchHarness.tmpfsRoot) + "/graft-onesegsmoke"
    Files.createDirectories(Paths.get(base))
    val spark = BenchHarness.session("graft-onesegsmoke", 32, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var ok = false
    try {
      // stage the corpus once so the build timing is clean
      val corpusDir = s"$base/corpus-$docs"
      if (!Files.exists(Paths.get(corpusDir, "_SUCCESS")))
        spark.range(0, docs, 1, 64).map(i => (url(i), text(i)))
          .toDF("url", "text").write.mode("overwrite").parquet(corpusDir)

      val idxDir = Files.createTempDirectory(Paths.get(base), "idx").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, spark.read.parquet(corpusDir), idxDir,
        IndexConfig(numSegments = 1, blockSize = 128,
          markerChunkDocs = ChunkDocs))
      val buildSec = (System.nanoTime() - t0) / 1e9
      val snap = Snapshot.latest(idxDir).get

      // ---- closed-form corpus statistics ----
      def countMod(m: Long): Long = (docs - 1) / m + 1 // |{i < docs : m | i}|
      val nNeedle = countMod(1000)
      val nRare = countMod(9973)
      val nEdgeLow = (docs - 1) / ChunkDocs // multiples of ChunkDocs, i > 0
      val nEdgeHigh = // i % ChunkDocs == ChunkDocs-1, i < docs
        if (docs < ChunkDocs) 0L else (docs - ChunkDocs) / ChunkDocs + 1
      val nEdge = nEdgeLow + nEdgeHigh
      val nBoth = countMod(9973000L) // needle AND rare (lcm = 9973*1000)
      val sumdl = 3 * docs + (docs / 8) * 28 + nNeedle + nRare + nEdge
      require(snap.numDocs == docs, s"numDocs ${snap.numDocs} != $docs")
      require(snap.sumDocLen == sumdl,
        s"sumDocLen ${snap.sumDocLen} != closed-form $sumdl")


      // ---- exact counts ----
      val (cNeedle, tNeedle) = timed(
        Searcher.count(spark, idxDir, BoolQuery(filter = Seq("needle"))))
      val (cEdge, tEdge) = timed(
        Searcher.count(spark, idxDir, BoolQuery(filter = Seq("edge"))))
      val (cBoth, tBoth) = timed(
        Searcher.count(spark, idxDir, BoolQuery(must = Seq("needle", "rare"))))
      require(cNeedle == nNeedle, s"count(needle) $cNeedle != $nNeedle")
      require(cEdge == nEdge, s"count(edge) $cEdge != $nEdge")
      require(cBoth == nBoth, s"count(needle&rare) $cBoth != $nBoth")

      // ---- scan enumeration across every chunk seam ----
      val (edgeRows, tScan) = timed(
        Searcher.matches(spark, idxDir, BoolQuery(filter = Seq("edge")))
          .orderBy("docId").as[(Long, String, Int)].collect())
      val expectedEdge = (1L until docs).filter(isEdge)
        .map(i => (i + 1, url(i), 0)) // P=1: rank(i) = i (urls sort like ids)
      require(edgeRows.toSeq == expectedEdge,
        s"edge enumeration drifted: got ${edgeRows.length} rows")

      // ---- bit-identical BM25 at scale (closed-form expectation) ----
      // query "vary": df = docs with i%8 != 0; best class tf=7, dl=10
      // (i%8==7, no planted extras); ties break by docId ascending
      val dfVary = docs - docs / 8
      val avgdl = Bm25.avgdl(docs, sumdl)
      val expScore = Bm25.idf(docs, dfVary) * Bm25.tfNorm(7, 10, avgdl)
      val expIds = Iterator.iterate(7L)(_ + 8)
        .filter(i => !isNeedle(i) && !isRare(i) && !isEdge(i))
        .take(10).map(_ + 1).toSeq
      val (hits, tTopK) = timed(Searcher.topK(spark, idxDir, "vary", 10))
      require(hits.map(_.docId).toSeq == expIds,
        s"top-10 docIds ${hits.map(_.docId).toSeq} != $expIds")
      require(hits.forall(_.score == expScore),
        s"scores ${hits.map(_.score).toSeq} != closed-form $expScore")
      require(hits.map(_.url).toSeq == expIds.map(d => url(d - 1)),
        "top-10 urls drifted")

      // ---- search_after stitching across the giant segment ----
      val h = new IndexHandle(spark, idxDir, warm = false)
      val oneShot = h.search(BoolQuery.text("vary"), 30)
      val p1 = h.searchAfter(BoolQuery.text("vary"), 15, None)
      val cursor = Some((p1.last.score, p1.last.docId))
      val p2 = h.searchAfter(BoolQuery.text("vary"), 15, cursor)
      require((p1 ++ p2).map(x => (x.docId, x.score)).toSeq ==
        oneShot.map(x => (x.docId, x.score)).toSeq, "search_after drifted")

      // ---- marker cell sizes: chunked, never monolithic ----
      val cells = spark.read.parquet(snap.dataDirs.map(d => s"$idxDir/$d"): _*)
        .as[PostingRow]
        .filter(col("term") === IndexBuilder.TermUrls)
        .map(r => (r.chunk, r.tfBytes.length.toLong))
        .collect()
      val urlChunks = cells.length
      val maxCell = cells.map(_._2).max
      val totalUrlBytes = cells.map(_._2).sum
      require(urlChunks == ((docs - 1) / ChunkDocs + 1).toInt,
        s"expected full chunking, got $urlChunks chunk rows")

      println(f"""{"oneseg_docs":$docs,"build_sec":$buildSec%.1f,"docs_per_sec":${docs / buildSec}%.0f,"url_chunks":$urlChunks,"max_url_cell_bytes":$maxCell,"total_url_bytes":$totalUrlBytes,"count_needle_sec":$tNeedle%.2f,"count_edge_sec":$tEdge%.2f,"count_conj_sec":$tBoth%.2f,"scan_edge_rows":${edgeRows.length},"scan_edge_sec":$tScan%.2f,"topk_sec":$tTopK%.2f,"all_closed_form_checks":"pass"}""")
      ok = true
    } finally {
      // stop FIRST, delete after: base holds the session's spark-local
      // dir, and deleting it under a live session races the shutdown
      // cleaner (IOExceptions + re-created files leaking tmpfs).
      // Success cleanup only — a failed require leaves the index behind.
      spark.stop()
      if (ok) BenchHarness.deleteDir(base)
    }
  }
}
