package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.search.Bm25

/** Index layout / tuning knobs. `numSegments` is a pinned property of the
  * index (doc placement depends on it), not of the cluster: the same input
  * yields bit-identical segments at any parallelism level. */
case class IndexConfig(
    numSegments: Int = 32,
    blockSize: Int = 128,
    saltBuckets: Int = 8)

/** On-disk posting row. One row per (segment, term) carrying the full
  * compressed posting list for that segment, plus per-block skip metadata:
  *
  *  - docBytes: delta + varint docIds (ascending within segment)
  *  - tfBytes:  varint term frequencies, aligned with docBytes
  *  - blockLast/blockMax/blockDocOff/blockTfOff: for every `blockSize`
  *    postings, the last docId, the max BM25 tf-norm in the block, and the
  *    byte offsets where the block's streams start (block-max WAND skips
  *    whole blocks without decoding them)
  *
  * Two special marker rows per segment use reserved `term` values the
  * analyzer can never emit: TermLens ("") carries varint doc lengths indexed
  * by seg-local rank, TermUrls ("") the length-prefixed url table.
  * Splitting urls from lens keeps the hot scoring path from deserializing
  * url bytes — urls are fetched only for the final k winners' segments.
  */
case class PostingRow(
    segId: Int,
    term: String,
    df: Long,
    cf: Long,
    maxTfNorm: Double,
    docBytes: Array[Byte],
    tfBytes: Array[Byte],
    blockLast: Array[Long],
    blockMax: Array[Double],
    blockDocOff: Array[Int],
    blockTfOff: Array[Int])

/** Row shape entering the streaming encoder. Doc rows (term == TermLens)
  * sort ahead of every real term within their segment. */
case class TokRow(
    segId: Int, term: String, docId: Long, tf: Int, doclen: Int, url: String)

private case class RankedRow(
    segId: Int, docId: Long, rank: Int, url: String, tfmap: Map[String, Int])

/** From-scratch distributed inverted-index build (the half the reference
  * delegates to Elasticsearch — SURVEY.md §2.8). Document-partitioned
  * segments like ES shards (the reference pins 8/16/32 shards per index,
  * per-index settings under mrtarget/resources/es): every segment holds the complete
  * posting lists for its slice of documents, so top-k queries run
  * segment-parallel and merge k-way.
  *
  * Determinism contract (BASELINE.json north_rule): docId is a pure function
  * of (url, numSegments) — segId = floorMod(hash64(url), P), seg-local rank =
  * position of url in the segment's url sort order, docId = segId<<40 | rank.
  * Neither execution order nor parallelism can change any byte of the index.
  *
  * Dataflow (single shuffle + one in-partition sort):
  *   pages(url,text)
  *     -> repartition(P, segId)                     [the only exchange]
  *     -> row_number() over (segId, url)            [reuses the exchange]
  *     -> analyze once, flatMap to doc/posting rows [narrow]
  *     -> sortWithinPartitions(segId, term, docId)  [external sort]
  *     -> mapPartitions streaming encoder           [narrow, run-bounded mem]
  *     -> parquet segments + snapshot commit
  *
  * Global stats (N, sum doclen) are integer aggregates committed in a
  * "stats" snapshot first, so block-max metadata is encoded against an
  * avgdl that is exact and identical on resume.
  */
object IndexBuilder {
  val SegShift = 40
  val TermLens = ""
  val TermUrls = "\u0001"

  def segBase(segId: Int): Long = segId.toLong << SegShift

  /** Build (or resume) the index for `pages` (needs `url`, `text` columns)
    * under `indexDir`. `simulateOnlySegments` lets tests model a build
    * killed partway: only those segments are committed, and a later resumed
    * call completes the rest from the snapshot log. */
  def build(
      spark: SparkSession,
      pages: DataFrame,
      indexDir: String,
      cfg: IndexConfig = IndexConfig(),
      resume: Boolean = false,
      simulateOnlySegments: Option[Set[Int]] = None): SnapshotMeta = {
    import spark.implicits._

    val prior = if (resume) Snapshot.latest(indexDir) else None
    prior.foreach { p =>
      require(p.numSegments == cfg.numSegments && p.blockSize == cfg.blockSize,
        s"resume config mismatch: snapshot P=${p.numSegments}/B=${p.blockSize}")
      if (p.isComplete) return p
    }

    val P = cfg.numSegments
    val tokenLenUdf = udf((text: String) => Analyzer.tokenize(text).length)
    val tfMapUdf = udf((text: String) => Analyzer.termFreqs(text))
    val segUdf = udf((url: String) => Hashing.segmentOf(url, P))

    // ---- pass 1: exact global stats (integer sums — reduction-order-proof)
    val stats = prior match {
      case Some(p) => (p.numDocs, p.sumDocLen)
      case None =>
        val row = pages
          .select(count(lit(1)).as("n"),
            coalesce(sum(tokenLenUdf(col("text")).cast("long")), lit(0L)).as("sumdl"))
          .head()
        val (n, sumdl) = (row.getLong(0), row.getLong(1))
        val statsSnap = SnapshotMeta(
          id = 1, parent = -1,
          status = "stats", numDocs = n, sumDocLen = sumdl,
          numSegments = P, blockSize = cfg.blockSize,
          dataDirs = Nil, termdictDir = None, segments = Nil)
        Snapshot.commit(indexDir, statsSnap)
        (n, sumdl)
    }
    val (numDocs, sumDocLen) = stats
    val avgdl = Bm25.avgdl(numDocs, sumDocLen)
    val snapAfterStats = Snapshot.latest(indexDir).get

    // ---- pass 2: build the missing segments only (resume = segment pruning)
    val done = prior.map(_.completedSegIds).getOrElse(Set.empty[Int])
    val wanted = (0 until P).filterNot(done.contains)
      .filter(s => simulateOnlySegments.forall(_.contains(s)))
    if (wanted.isEmpty) return snapAfterStats
    val snapId = snapAfterStats.id + 1
    val buildDirRel = f"data/build-$snapId%05d"
    val buildDir = s"$indexDir/$buildDirRel"

    val blockSize = cfg.blockSize
    val ranked = pages.select(col("url"), col("text"))
      .withColumn("segId", segUdf(col("url")))
      .filter(col("segId").isin(wanted: _*))
      .repartition(P, col("segId"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("segId")).orderBy(col("url"))))
      .withColumn("docId",
        shiftleft(col("segId").cast("long"), SegShift) + col("rank"))
      .withColumn("tfmap", tfMapUdf(col("text")))
      .select("segId", "docId", "rank", "url", "tfmap")
      .as[RankedRow]

    val tokRows = ranked.flatMap { r =>
      val doclen = r.tfmap.valuesIterator.sum
      Iterator.single(TokRow(r.segId, TermLens, r.docId, 0, doclen, r.url)) ++
        r.tfmap.iterator.map { case (t, f) =>
          TokRow(r.segId, t, r.docId, f, doclen, null)
        }
    }

    tokRows
      .sortWithinPartitions("segId", "term", "docId")
      .mapPartitions(it => encodePartition(it, blockSize, avgdl))
      .write.mode("overwrite").parquet(buildDir)

    // per-segment lineage metrics from the freshly written segments
    val metrics = spark.read.parquet(buildDir)
      .groupBy("segId").agg(
        max(when(col("term") === TermLens, col("df")).otherwise(0L)).as("docs"),
        sum(when(col("term") > TermUrls, 1L).otherwise(0L)).as("terms"),
        sum(when(col("term") > TermUrls, col("df")).otherwise(0L)).as("postings"))
      .collect()
      .map(r => SegmentMeta(r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), buildDirRel))
      .sortBy(_.segId).toSeq

    val allSegments = (prior.map(_.segments).getOrElse(Nil) ++ metrics).sortBy(_.segId)
    val allDataDirs = (prior.map(_.dataDirs).getOrElse(Nil) :+ buildDirRel).distinct
    val complete = allSegments.map(_.segId).distinct.size == P

    // ---- pass 3: term dictionary over all committed segments.
    // Explicit two-phase salted aggregation: head terms (Zipf skew) are first
    // combined per (term, salt) bucket, then reduced per term — the salted
    // merge step the north rule requires for posting consolidation at scale.
    val termdictRel = if (complete) Some(f"termdict/snap-$snapId%05d") else None
    termdictRel.foreach { rel =>
      spark.read.parquet(allDataDirs.map(d => s"$indexDir/$d"): _*)
        .filter(col("term") > TermUrls)
        .select("term", "segId", "df", "cf", "maxTfNorm")
        .groupBy(col("term"), pmod(col("segId"), lit(cfg.saltBuckets)).as("salt"))
        .agg(sum("df").as("df"), sum("cf").as("cf"),
          max("maxTfNorm").as("maxTfNorm"))
        .groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"),
          max("maxTfNorm").as("maxTfNorm"))
        .sort("term")
        .write.mode("overwrite").parquet(s"$indexDir/$rel")
    }

    val snap = SnapshotMeta(
      id = snapId, parent = snapAfterStats.id, status = "segments",
      numDocs = numDocs, sumDocLen = sumDocLen,
      numSegments = P, blockSize = blockSize,
      dataDirs = allDataDirs, termdictDir = termdictRel, segments = allSegments)
    Snapshot.commit(indexDir, snap)
    snap
  }

  /** Lazily encode one sorted partition: memory is bounded by a single
    * (segId, term) run plus the current segment's doc-length/url tables.
    * Input must be sorted by (segId, term, docId); doc rows lead each seg. */
  private[index] def encodePartition(
      rows: Iterator[TokRow], blockSize: Int, avgdl: Double): Iterator[PostingRow] =
    new Iterator[PostingRow] {
      private val it = rows.buffered
      private val pending = scala.collection.mutable.Queue.empty[PostingRow]

      override def hasNext: Boolean = pending.nonEmpty || it.hasNext

      override def next(): PostingRow = {
        if (pending.nonEmpty) return pending.dequeue()
        val segId = it.head.segId
        if (it.head.term == TermLens) {
          // consume the segment's doc rows (contiguous, rank order)
          val lens = ArrayBuffer.empty[Int]
          val urls = ArrayBuffer.empty[String]
          var sumLen = 0L
          while (it.hasNext && it.head.segId == segId && it.head.term == TermLens) {
            val r = it.next()
            lens += r.doclen
            urls += r.url
            sumLen += r.doclen
          }
          pending.enqueue(PostingRow(segId, TermUrls, urls.length.toLong, 0L, 0.0,
            Array.emptyByteArray, Varint.encodeStrings(urls),
            Array.emptyLongArray, Array.emptyDoubleArray,
            Array.emptyIntArray, Array.emptyIntArray))
          PostingRow(segId, TermLens, lens.length.toLong, sumLen, 0.0,
            Varint.encodeInts(lens), Array.emptyByteArray,
            Array.emptyLongArray, Array.emptyDoubleArray,
            Array.emptyIntArray, Array.emptyIntArray)
        } else {
          // consume one (segId, term) posting run
          val term = it.head.term
          val docOut = new java.io.ByteArrayOutputStream()
          val tfOut = new java.io.ByteArrayOutputStream()
          val blockLast = ArrayBuffer.empty[Long]
          val blockMax = ArrayBuffer.empty[Double]
          val blockDocOff = ArrayBuffer.empty[Int]
          val blockTfOff = ArrayBuffer.empty[Int]
          var prevDoc = segBase(segId)
          var inBlock = 0
          var nPostings = 0L
          var cf = 0L
          var termMax = 0.0
          var blockMaxV = 0.0
          var lastDoc = 0L
          while (it.hasNext && it.head.segId == segId && it.head.term == term) {
            val r = it.next()
            if (inBlock == 0) {
              blockDocOff += docOut.size()
              blockTfOff += tfOut.size()
            }
            Varint.writeLong(docOut, r.docId - prevDoc)
            Varint.writeInt(tfOut, r.tf)
            prevDoc = r.docId
            lastDoc = r.docId
            val tn = Bm25.tfNorm(r.tf, r.doclen, avgdl)
            if (tn > blockMaxV) blockMaxV = tn
            if (tn > termMax) termMax = tn
            cf += r.tf
            nPostings += 1
            inBlock += 1
            if (inBlock == blockSize) {
              blockLast += lastDoc
              blockMax += blockMaxV
              inBlock = 0
              blockMaxV = 0.0
            }
          }
          if (inBlock > 0) {
            blockLast += lastDoc
            blockMax += blockMaxV
          }
          PostingRow(segId, term, nPostings, cf, termMax,
            docOut.toByteArray, tfOut.toByteArray,
            blockLast.toArray, blockMax.toArray,
            blockDocOff.toArray, blockTfOff.toArray)
        }
      }
    }
}
