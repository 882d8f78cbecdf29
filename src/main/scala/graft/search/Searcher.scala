package graft.search

import scala.collection.mutable.ArrayBuffer
import scala.collection.parallel.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, PostingRow, Snapshot, SnapshotMeta, Varint}

final case class Hit(rank: Int, docId: Long, url: String, score: Double)

/** Distributed BM25 top-k over a committed index snapshot.
  *
  * Query plan: the term dictionary is probed for the query terms (Parquet
  * predicate pushdown on the sorted `term` column — the FST-analogue lookup),
  * idfs are broadcast, then only the matching posting rows + per-segment
  * doc-length rows shuffle to a per-segment block-max WAND
  * (`groupByKey(segId).flatMapGroups`), each segment emitting its local
  * top-k. The global answer is the k-way merge `orderBy(score desc, docId
  * asc).limit(k)` — Spark's TakeOrderedAndProject. Urls are resolved for the
  * k winners only, touching just the winning segments' url rows. */
object Searcher {

  def topK(spark: SparkSession, indexDir: String, query: String, k: Int): Array[Hit] =
    new IndexHandle(spark, indexDir, warm = false).topK(query, k)

  /** DataFrame form for SparkEntry / driver smoke checks. */
  def topKDF(spark: SparkSession, indexDir: String, query: String, k: Int): DataFrame = {
    import spark.implicits._
    topK(spark, indexDir, query, k).toSeq
      .toDF("rank", "docId", "url", "score")
  }
}

/** A queryable snapshot. With `warm = true` the posting table is
  * re-clustered by segment and persisted in executor memory, and the term
  * dictionary is collected to a driver map (bounded by `dictLimit`), so a
  * steady-state query is ONE shuffle-free Spark job: filter the cached
  * postings (predicate pushdown / in-memory batch pruning on `term`) ->
  * per-partition WAND over the colocated segments -> global
  * TakeOrderedAndProject. The cold path (warm = false) reads parquet
  * directly and probes the dictionary with a pushed-down filter instead. */
final class IndexHandle(spark: SparkSession, indexDir: String, warm: Boolean = true,
    dictLimit: Long = 2000000) {
  import spark.implicits._

  val snap: SnapshotMeta = Snapshot.latest(indexDir)
    .getOrElse(throw new IllegalStateException(s"no snapshot under $indexDir"))
  require(snap.isComplete,
    s"index incomplete: ${snap.segments.size}/${snap.numSegments} segments")

  private val dataPaths = snap.dataDirs.map(d => s"$indexDir/$d")
  private val avgdl = snap.avgdl
  private val blockSize = snap.blockSize

  private val termdict: DataFrame =
    spark.read.parquet(s"$indexDir/${snap.termdictDir.get}")
  // driver-side dictionary for warm handles on sane vocabularies
  private val driverDict: Option[Map[String, Long]] =
    if (warm && snap.segments.map(_.terms).sum <= dictLimit * snap.numSegments) {
      val m = termdict.select("term", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (m.size <= dictLimit) Some(m) else None
    } else None

  private val postings: Dataset[PostingRow] = {
    val ds = spark.read.parquet(dataPaths: _*).as[PostingRow]
    if (warm) {
      // cluster by segment (query path then needs no exchange) and sort by
      // term within partitions: the in-memory columnar cache keeps min/max
      // stats per batch, so the per-query term filter prunes whole batches
      // instead of decompressing every posting blob
      val c = ds.repartition(col("segId"))
        .sortWithinPartitions("term", "segId").cache()
      c.count()
      c
    } else ds
  }

  // warm handles memoize per-segment url tables on the driver: the second
  // per-query Spark job disappears once a segment's winners have been seen
  private val urlCache = scala.collection.mutable.HashMap.empty[Int, Array[String]]

  // served path: hot posting rows + doc-length tables memoized on the
  // driver (bounded LRU), so repeated-term queries never touch the cluster
  // — the role the reference's LRU-cached ES lookups play
  // (mrtarget/common/LookupTables.py:54-142). Cold terms cost one filtered
  // Spark fetch; everything after is local WAND over all segments.
  private val servedTermCap = 10000
  private val postingCache =
    new java.util.LinkedHashMap[String, Array[PostingRow]](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[PostingRow]]): Boolean =
        size() > servedTermCap
    }
  private var lensCache: Map[Int, Array[Int]] = null

  private def fetchLens(): Map[Int, Array[Int]] = synchronized {
    if (lensCache == null)
      lensCache = postings.filter(col("term") === IndexBuilder.TermLens)
        .collect().map(r => r.segId -> Varint.decodeInts(r.docBytes)).toMap
    lensCache
  }

  private def fetchPostings(terms: Seq[String]): Map[String, Array[PostingRow]] =
    synchronized {
      val missing = terms.filterNot(postingCache.containsKey)
      if (missing.nonEmpty)
        postings.filter(col("term").isin(missing: _*)).collect()
          .groupBy(_.term)
          .foreach { case (t, rows) => postingCache.put(t, rows) }
      terms.iterator
        .map(t => t -> Option(postingCache.get(t)).getOrElse(Array.empty[PostingRow]))
        .toMap
    }

  /** Hot-serving top-k: rank-identical to `topK` (same Wand/Bm25 code, same
    * ascending-term evaluation, same (score desc, docId asc) merge), but
    * segments are scored sequentially on the driver from memoized postings. */
  def servedTopK(query: String, k: Int): Array[Hit] = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted
    if (qTerms.isEmpty) return Array.empty
    val dfByTerm: Map[String, Long] = driverDict match {
      case Some(m) => qTerms.iterator.flatMap(t => m.get(t).map(t -> _)).toMap
      case None => termdict.filter(col("term").isin(qTerms: _*))
        .select("term", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val terms = qTerms.filter(dfByTerm.contains)
    if (terms.isEmpty) return Array.empty
    val idfMap = terms.map(t => t -> Bm25.idf(snap.numDocs, dfByTerm(t))).toMap
    val lens = fetchLens()
    val rowsByTerm = fetchPostings(terms)

    val bySeg = scala.collection.mutable.LinkedHashMap.empty[Int, ArrayBuffer[PostingRow]]
    terms.foreach { t =>
      rowsByTerm(t).foreach(r => bySeg.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r)
    }
    // segments score independently; parallelize across driver cores (the
    // per-segment WAND state is private; merge order is pinned afterwards)
    val hits = bySeg.toSeq.par.flatMap { case (segId, rows) =>
      lens.get(segId) match {
        case None => Seq.empty
        case Some(l) =>
          val iters = rows.sortBy(_.term)
            .map(r => new PostingIterator(r, idfMap(r.term), blockSize, avgdl))
            .toArray
          iters.foreach(_.start())
          Wand.topK(iters, l, IndexBuilder.segBase(segId), avgdl, k).toSeq
            .map(h => (h.docId, h.score, segId))
      }
    }.seq.toArray
    val top = hits.sortBy { case (docId, score, _) => (-score, docId) }.take(k)
    if (top.isEmpty) return Array.empty
    val missingSegs = urlCache.synchronized(
      top.map(_._3).distinct.toSeq.filterNot(urlCache.contains))
    if (missingSegs.nonEmpty) {
      val fetched = postings
        .filter(col("term") === IndexBuilder.TermUrls &&
          col("segId").isin(missingSegs: _*))
        .collect().map(r => r.segId -> Varint.decodeStrings(r.tfBytes))
      urlCache.synchronized(urlCache ++= fetched)
    }
    top.zipWithIndex.map { case ((docId, score, seg), i) =>
      val url = urlCache.synchronized(urlCache(seg))(
        (docId - IndexBuilder.segBase(seg) - 1).toInt)
      Hit(i + 1, docId, url, score)
    }
  }

  def close(): Unit = if (warm) postings.unpersist()

  def topK(query: String, k: Int): Array[Hit] = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted
    if (qTerms.isEmpty) return Array.empty
    val dfByTerm: Map[String, Long] = driverDict match {
      case Some(m) => qTerms.iterator.flatMap(t => m.get(t).map(t -> _)).toMap
      case None => termdict
        .filter(col("term").isin(qTerms: _*))
        .select("term", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val terms = qTerms.filter(dfByTerm.contains)
    if (terms.isEmpty) return Array.empty

    val idfMap = terms.map(t => t -> Bm25.idf(snap.numDocs, dfByTerm(t))).toMap
    val idfB = spark.sparkContext.broadcast(idfMap)
    val kk = k
    val avg = avgdl
    val bs = blockSize

    val wanted: Seq[String] = IndexBuilder.TermLens +: terms
    def wandSegments(rowsIt: Iterator[PostingRow]): Iterator[(Long, Double, Int)] = {
      var lensFor = Map.empty[Int, Array[Int]]
      val posting = scala.collection.mutable.LinkedHashMap
        .empty[Int, ArrayBuffer[PostingRow]]
      rowsIt.foreach { r =>
        if (r.term == IndexBuilder.TermLens)
          lensFor += r.segId -> Varint.decodeInts(r.docBytes)
        else posting.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r
      }
      posting.iterator.flatMap { case (segId, rows) =>
        lensFor.get(segId) match {
          case None => Iterator.empty
          case Some(lens) =>
            val iters = rows.sortBy(_.term)
              .map(r => new PostingIterator(r, idfB.value(r.term), bs, avg))
              .toArray
            iters.foreach(_.start())
            Wand.topK(iters, lens, IndexBuilder.segBase(segId), avg, kk)
              .iterator.map(h => (h.docId, h.score, segId))
        }
      }
    }
    val filtered = postings.filter(col("term").isin(wanted: _*))
    // warm: the cache is explicitly clustered by segId, so per-partition
    // local grouping is safe and the query runs with ZERO exchanges.
    // cold: parquet splits can fragment a segment across tasks, so group
    // by key (the shuffle moves only the filtered posting rows).
    val scoredDs =
      if (warm) filtered.mapPartitions(wandSegments)
      else filtered.groupByKey(_.segId)
        .flatMapGroups((_: Int, it: Iterator[PostingRow]) => wandSegments(it))
    val hits = scoredDs
      .toDF("docId", "score", "segId")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()

    if (hits.isEmpty) return Array.empty
    val winnerSegs = hits.map(_.getInt(2)).distinct.toSeq
    val missingSegs =
      if (warm) urlCache.synchronized(winnerSegs.filterNot(urlCache.contains))
      else winnerSegs
    if (missingSegs.nonEmpty) {
      val fetched = postings
        .filter(col("term") === IndexBuilder.TermUrls &&
          col("segId").isin(missingSegs: _*))
        .collect()
        .map(r => r.segId -> Varint.decodeStrings(r.tfBytes))
      if (warm) urlCache.synchronized(urlCache ++= fetched)
      else urlCache.synchronized {
        fetched.foreach { case (s2, u) => urlCache.getOrElseUpdate(s2, u) }
      }
    }
    val urlOf: (Int, Long) => String = (seg, docId) =>
      urlCache.synchronized(urlCache(seg))(
        (docId - IndexBuilder.segBase(seg) - 1).toInt)

    hits.zipWithIndex.map { case (r, i) =>
      Hit(i + 1, r.getLong(0), urlOf(r.getInt(2), r.getLong(0)), r.getDouble(1))
    }
  }
}

/** Deliberately naive exhaustive scorer — the in-repo "reference
  * implementation" the rank-identical acceptance tests compare against
  * (SURVEY.md §5 item 2). Pure driver-side Scala over raw (url, text) rows:
  * no index, no pruning; shares only Analyzer/Bm25/Hashing so that token
  * streams, docIds and float orders are pinned identically by construction. */
object OracleSearch {

  /** Spark sorts strings as UTF8String binary = unsigned UTF-8 byte order;
    * Scala's String ordering compares UTF-16 code units, which diverges for
    * supplementary characters (a surrogate pair sorts below U+E000 in UTF-16
    * but above it in UTF-8). The oracle must rank urls exactly like the
    * builder's `orderBy(url)` or docIds diverge for non-ASCII urls. */
  private[search] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
  private val utf8Ordering: Ordering[String] = (a, b) => utf8Compare(a, b)

  def topK(
      docs: Seq[(String, String)], // (url, text)
      query: String,
      k: Int,
      numSegments: Int): Array[Hit] = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted
    if (qTerms.isEmpty) return Array.empty

    // docIds exactly as the builder assigns them
    val withIds: Seq[(Long, String, String)] = docs
      .map { case (url, text) =>
        (graft.index.Hashing.segmentOf(url, numSegments), url, text)
      }
      .groupBy(_._1).toSeq
      .flatMap { case (seg, rows) =>
        rows.sortBy(_._2)(utf8Ordering).zipWithIndex.map { case ((_, url, text), i) =>
          (IndexBuilder.segBase(seg) + i + 1, url, text)
        }
      }

    val tfs = withIds.map { case (id, url, text) => (id, url, Analyzer.termFreqs(text)) }
    val n = tfs.size.toLong
    val sumdl = tfs.iterator.map(_._3.valuesIterator.sum.toLong).sum
    if (n == 0) return Array.empty
    val avgdl = Bm25.avgdl(n, sumdl)
    val dfByTerm = qTerms.map { t => t -> tfs.count(_._3.contains(t)).toLong }.toMap

    val scored = tfs.flatMap { case (id, url, tf) =>
      val doclen = tf.valuesIterator.sum
      var s = 0.0
      var any = false
      qTerms.foreach { t => // ascending term order — float parity with Wand
        val f = tf.getOrElse(t, 0)
        if (f > 0 && dfByTerm(t) > 0) {
          any = true
          s += Bm25.idf(n, dfByTerm(t)) * Bm25.tfNorm(f, doclen, avgdl)
        }
      }
      if (any) Some((id, url, s)) else None
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, url, s), i) => Hit(i + 1, id, url, s) }
      .toArray
  }
}
