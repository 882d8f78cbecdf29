package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.tools.BenchHarness.timed
import graft.index.{Deletes, IndexBuilder, IndexConfig, PostingRow, Snapshot}
import graft.search.{Bm25, BoolQuery, Searcher}

/** Scale evidence for the STREAMING purge path: the segment's url marker
  * chunks (its dominant bytes) must pass through a purge unbuffered, and
  * post-purge statistics/scores must equal a fresh build over the live
  * documents. This tool builds millions of documents into ONE segment
  * (many marker-chunk seams), mass-deletes a planted token class by
  * query, purges, and verifies everything against CLOSED-FORM
  * expectations — every document is a pure arithmetic function of its
  * row id, so live counts, surviving docIds/urls and BM25 scores are all
  * computable driver-side (the deleted class is small enough to fold
  * exactly).
  *
  * Checks after deleteByQuery("needle") + purge:
  *  - snapshot numDocs/sumDocLen equal the closed-form live sums
  *  - count(needle) == 0; count(edge)/count(rare) drop by exactly the
  *    deleted overlap
  *  - matchesDF("edge") returns the SAME docIds/urls as pre-purge for
  *    survivors (dead rank slots stay in the tables — docId stability is
  *    the chunking invariant purge must preserve)
  *  - BM25 top-k scores equal the closed-form value recomputed from
  *    post-purge live df/avgdl — i.e. purge rewrote stats live-only
  *  - the consolidated tombstone row covers exactly the deleted class;
  *    url chunk count and max cell size are unchanged (pass-through)
  *
  * Usage: runMain graft.tools.PurgeSmoke [docs]   (default 2^23 ≈ 8.4M;
  * one JSON line on stdout). */
object PurgeSmoke {

  private val ChunkDocs = 1 << 18 // many seams at the default size

  def url(i: Long): String =
    f"https://purge.smoke/section/subsection/archive-2024/item-area/d$i%09d/index.html"

  private def isNeedle(i: Long) = i % 1000 == 0
  private def isRare(i: Long) = i % 9973 == 0
  private def isEdge(i: Long) =
    (i % ChunkDocs == 0 && i > 0) || i % ChunkDocs == ChunkDocs - 1
  private def varyTf(i: Long): Int = (i % 8).toInt
  private def dlOf(i: Long): Long =
    3L + varyTf(i) + (if (isNeedle(i)) 1 else 0) +
      (if (isRare(i)) 1 else 0) + (if (isEdge(i)) 1 else 0)

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
    val docs = args.headOption.map(_.toLong).getOrElse(1L << 23)
    require(docs % 8 == 0, "docs must be a multiple of 8 (closed-form sumdl)")
    // closed-form identities assume rank == i: urls are zero-padded to 9
    // digits, so beyond 1e9 docs they stop sorting numerically and the
    // docId expectations would implicate the engine spuriously. The lower
    // bound guarantees 10 undeleted tf=7 docs for the top-k expectation.
    require(docs >= 10000 && docs <= 1000000000L,
      s"docs must be in [1e4, 1e9] for the closed-form checks: $docs")
    val base = sys.env.getOrElse("GRAFT_SMOKE_TMP",
      BenchHarness.tmpfsRoot) + "/graft-purgesmoke"
    Files.createDirectories(Paths.get(base))
    val spark = BenchHarness.session("graft-purgesmoke", 32, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var ok = false
    try {
      val corpusDir = s"$base/corpus-$docs"
      if (!Files.exists(Paths.get(corpusDir, "_SUCCESS")))
        spark.range(0, docs, 1, 64).map(i => (url(i), text(i)))
          .toDF("url", "text").write.mode("overwrite").parquet(corpusDir)

      val idxDir = Files.createTempDirectory(Paths.get(base), "idx").toString
      val (_, buildSec) = timed(
        IndexBuilder.build(spark, spark.read.parquet(corpusDir), idxDir,
          IndexConfig(numSegments = 1, blockSize = 128,
            markerChunkDocs = ChunkDocs)))

      // ---- closed-form corpus statistics ----
      def countMod(m: Long): Long = (docs - 1) / m + 1
      val nNeedle = countMod(1000)
      val nRare = countMod(9973)
      val nEdge = (docs - 1) / ChunkDocs +
        (if (docs < ChunkDocs) 0L else (docs - ChunkDocs) / ChunkDocs + 1)
      val sumdl = 3 * docs + (docs / 8) * 28 + nNeedle + nRare + nEdge
      // fold the (small) deleted class exactly: its dl sum and overlaps
      val deleted = (0L until docs by 1000)
      val deadDl = deleted.map(dlOf).sum
      val deadEdge = deleted.count(isEdge)
      val deadRare = deleted.count(isRare)
      val deadVary = deleted.count(i => varyTf(i) > 0) // 1000 = 8*125 -> 0
      val liveDocs = docs - nNeedle
      val liveSumdl = sumdl - deadDl

      // ---- pre-purge reference: survivor enumeration must not move ----
      val preEdge = Searcher.matches(spark, idxDir,
          BoolQuery(filter = Seq("edge")))
        .orderBy("docId").as[(Long, String, Int)].collect()
        .filterNot { case (docId, _, _) => isNeedle(docId - 1) } // P=1: rank=i

      val (_, delSec) = timed(
        Deletes.deleteByQuery(spark, idxDir, BoolQuery(filter = Seq("needle"))))
      require(Snapshot.latest(idxDir).get.deletedDocs == nNeedle,
        "deleteByQuery tombstoned an unexpected count")
      val (_, purgeSec) = timed(Deletes.purge(spark, idxDir))

      // ---- snapshot stats: live-only, closed-form ----
      val snap = Snapshot.latest(idxDir).get
      require(snap.deletedDocs == 0L, "purge left deletedDocs nonzero")
      require(snap.numDocs == liveDocs,
        s"post-purge numDocs ${snap.numDocs} != closed-form $liveDocs")
      require(snap.sumDocLen == liveSumdl,
        s"post-purge sumDocLen ${snap.sumDocLen} != closed-form $liveSumdl")

      // ---- exact counts over the purged index ----
      val (c0, tNeedle) = timed(
        Searcher.count(spark, idxDir, BoolQuery(filter = Seq("needle"))))
      require(c0 == 0L, s"count(needle) $c0 != 0 after purge")
      val (cEdge, tEdge) = timed(
        Searcher.count(spark, idxDir, BoolQuery(filter = Seq("edge"))))
      require(cEdge == nEdge - deadEdge,
        s"count(edge) $cEdge != ${nEdge - deadEdge}")
      val cRare = Searcher.count(spark, idxDir, BoolQuery(filter = Seq("rare")))
      require(cRare == nRare - deadRare,
        s"count(rare) $cRare != ${nRare - deadRare}")

      // ---- survivor docId/url stability across purge ----
      val (postEdge, tScan) = timed(
        Searcher.matches(spark, idxDir, BoolQuery(filter = Seq("edge")))
          .orderBy("docId").as[(Long, String, Int)].collect())
      require(postEdge.toSeq == preEdge.toSeq,
        s"survivor enumeration moved: ${postEdge.length} vs ${preEdge.length} rows")

      // ---- BM25 with post-purge live statistics, closed-form ----
      val dfVary = docs - docs / 8 - deadVary
      val avgdl = Bm25.avgdl(liveDocs, liveSumdl)
      val expScore = Bm25.idf(liveDocs, dfVary) * Bm25.tfNorm(7, 10, avgdl)
      val expIds = Iterator.iterate(7L)(_ + 8)
        .filter(i => !isNeedle(i) && !isRare(i) && !isEdge(i))
        .take(10).map(_ + 1).toSeq
      val (hits, tTopK) = timed(Searcher.topK(spark, idxDir, "vary", 10))
      require(hits.map(_.docId).toSeq == expIds,
        s"top-10 docIds ${hits.map(_.docId).toSeq} != $expIds")
      require(hits.forall(_.score == expScore),
        s"scores ${hits.map(_.score).toSeq} != closed-form $expScore")

      // ---- physical layout: pass-through urls + consolidated tombstone ----
      val rows = spark.read.parquet(snap.dataDirs.map(d => s"$idxDir/$d"): _*)
        .as[PostingRow]
      val urlCells = rows.filter(col("term") === IndexBuilder.TermUrls)
        .map(r => r.tfBytes.length.toLong).collect()
      require(urlCells.length == ((docs - 1) / ChunkDocs + 1).toInt,
        s"url chunk count changed across purge: ${urlCells.length}")
      val dels = rows.filter(col("term") === IndexBuilder.TermDels)
        .map(r => (r.df, r.docBytes.length.toLong)).collect()
      require(dels.length == 1 && dels.head._1 == nNeedle,
        s"expected one consolidated tombstone of df=$nNeedle, got ${dels.toSeq}")

      println(f"""{"purge_docs":$docs,"deleted":$nNeedle,"build_sec":$buildSec%.1f,"delete_sec":$delSec%.1f,"purge_sec":$purgeSec%.1f,"purge_docs_per_sec":${docs / purgeSec}%.0f,"url_chunks":${urlCells.length},"max_url_cell_bytes":${urlCells.max},"tombstone_bytes":${dels.head._2},"count_needle_sec":$tNeedle%.2f,"count_edge_sec":$tEdge%.2f,"scan_edge_sec":$tScan%.2f,"topk_sec":$tTopK%.2f,"all_closed_form_checks":"pass"}""")
      ok = true
    } finally {
      // stop FIRST, delete after: base holds the session's spark-local
      // dir, and deleting it under a live session races the shutdown
      // cleaner. Success cleanup only — a failed require leaves the
      // index behind for inspection.
      spark.stop()
      if (ok) BenchHarness.deleteDir(base)
    }
  }
}
