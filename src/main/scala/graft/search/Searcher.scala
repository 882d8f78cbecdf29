package graft.search

import scala.collection.mutable.ArrayBuffer
import scala.collection.parallel.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{Hashing, IndexBuilder, PostingRow, Snapshot, SnapshotMeta, Varint}

final case class Hit(rank: Int, docId: Long, url: String, score: Double)

/** Distributed BM25 top-k over a committed index snapshot.
  *
  * Query plan: the term dictionary is probed for the query terms (Parquet
  * predicate pushdown on the sorted `term` column — the FST-analogue lookup),
  * idfs are broadcast, then only the matching posting rows + per-segment
  * doc-length rows shuffle to a per-segment scorer
  * (`groupByKey(segId).flatMapGroups`) — block-max WAND for pure-should
  * queries, leapfrog conjunction for must/filter/ids queries — each segment
  * emitting its local top-k. The global answer is the k-way merge
  * `orderBy(score desc, docId asc).limit(k)` — Spark's
  * TakeOrderedAndProject. Urls are resolved for the k winners only, touching
  * just the winning segments' url rows. */
object Searcher {

  /** Serializes warm-cache builds' save/set/restore of the in-memory
    * columnar batch-size conf (see IndexHandle.postings). */
  private[search] val cacheBuildLock = new Object

  /** Binary search in UTF-8 byte order — the order the builder sorted by.
    * Static (no handle state) so executor-side probes don't capture the
    * handle in their closure. */
  private[search] def binarySearchUtf8(tab: Array[String], u: String): Int = {
    var lo = 0
    var hi = tab.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = OracleSearch.utf8Compare(tab(mid), u)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return mid
    }
    -1
  }

  def topK(spark: SparkSession, indexDir: String, query: String, k: Int): Array[Hit] =
    new IndexHandle(spark, indexDir, warm = false).topK(query, k)

  def search(spark: SparkSession, indexDir: String, q: BoolQuery, k: Int): Array[Hit] =
    new IndexHandle(spark, indexDir, warm = false).search(q, k)

  /** Deep paging (see IndexHandle.searchAfter): next k hits strictly after
    * the (score, docId) cursor under (score desc, docId asc). */
  def searchAfter(spark: SparkSession, indexDir: String, q: BoolQuery, k: Int,
      after: Option[(Double, Long)]): Array[Hit] =
    new IndexHandle(spark, indexDir, warm = false).searchAfter(q, k, after)

  /** Exact total-hit count (see IndexHandle.countMatches): ES
    * `track_total_hits=true` / `Search.count()`. */
  def count(spark: SparkSession, indexDir: String, q: BoolQuery): Long =
    new IndexHandle(spark, indexDir, warm = false).countMatches(q)

  /** Query-filtered full enumeration (see IndexHandle.matchesDF): ES
    * scan-with-query / scroll, as a DataFrame. */
  def matches(spark: SparkSession, indexDir: String, q: BoolQuery): DataFrame =
    new IndexHandle(spark, indexDir, warm = false).matchesDF(q)

  /** DataFrame form for SparkEntry / driver smoke checks. */
  def topKDF(spark: SparkSession, indexDir: String, query: String, k: Int): DataFrame = {
    import spark.implicits._
    topK(spark, indexDir, query, k).toSeq
      .toDF("rank", "docId", "url", "score")
  }

  /** ES `_source includes` analogue (the reference projects every scan:
    * mrtarget/modules/Association.py:308, common/LookupTables.py:103):
    * decorate hits with `includes` columns of the corpus table. The hit
    * side is top-k-sized, so it broadcasts; the corpus scan reads exactly
    * (url ++ includes) — Catalyst prunes the parquet ReadSchema to the
    * requested fields, the whole point of `_source` filtering. Output keeps
    * hit order (rank asc). */
  def fetchSource(spark: SparkSession, hits: Array[Hit], corpus: DataFrame,
      includes: Seq[String], urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, min, struct}
    import spark.implicits._
    require(urlCol == "url" || !includes.contains("url"),
      "includes may not contain a column named 'url' unless urlCol is 'url'")
    val incs = includes.distinct.filter(_ != urlCol)
    val hitDf = hits.toSeq.toDF("rank", "docId", "url", "score")
    // semi-join prune BEFORE the dedup aggregation (guide §3.2): the hit
    // urls are known driver-side and k-bounded, so the corpus scan reads
    // only their rows (parquet-pushed IN filter) instead of aggregating
    // the whole corpus to then keep k rows of it. Same result: non-hit
    // urls could never join anyway.
    val hitUrls = hits.map(_.url).distinct.toSeq
    val corpusPruned = corpus.filter(col(urlCol).isin(hitUrls: _*))
    // exactly one deterministic source row per url: a recrawl-shaped corpus
    // may hold several editions of a hit url, and ES returns one _source
    // per hit, never a fan-out (min(struct) = deterministic pick, the same
    // idiom as ops.Lookup)
    val src =
      if (incs.isEmpty)
        corpusPruned.select(col(urlCol).as("url")).distinct()
      else corpusPruned.select((urlCol +: incs).map(col): _*)
        .withColumnRenamed(urlCol, "url")
        .groupBy(col("url"))
        .agg(min(struct(incs.map(col): _*)).as("_src"))
        .select(col("url") +: incs.map(c => col(s"_src.$c").as(c)): _*)
    broadcast(hitDf).join(src, Seq("url"), "left")
      .orderBy(col("rank"))
      .select(Seq("rank", "docId", "url", "score").map(col) ++
        incs.map(col): _*)
  }
}

/** Compiled form of a [[BoolQuery]] against one snapshot: clause term
  * arrays, idfs for the scoring terms, and ids resolved to per-segment
  * sorted docId allowlists. Plain data — serializable into executor
  * closures without dragging the session-holding handle along. */
private[search] final case class CompiledQuery(
    must: Array[String],
    filter: Array[String],
    mustNot: Array[String],
    scoringTerms: Array[String], // must ∪ should, sorted asc
    idf: Map[String, Double],
    hasIds: Boolean,
    idsBySeg: Map[Int, Array[Long]]) {
  def hasRequired: Boolean = must.nonEmpty || filter.nonEmpty || hasIds
  def allTerms: Array[String] =
    (must ++ filter ++ mustNot ++ scoringTerms).distinct
}

/** Driver-side LRU bounded by APPROXIMATE BYTES. Entry-COUNT caps never
  * bind when an index has few, large segments (numSegments=32 is the
  * default — a 4096-segment cap would happily hold every doc-length table
  * of a 10^9-doc index, the exact driver OOM the caches exist to avoid).
  * Eviction walks LRU-first; the most recent entry always survives even
  * when it alone exceeds the budget (the caller is about to use it).
  * NOT internally synchronized — callers hold their own lock, matching
  * the fetch paths' lock-free-Spark-fetch discipline. */
private[search] final class BytesLru[K, V](maxBytes: Long,
    sizeOf: (K, V) => Long) {
  private var bytes = 0L
  private val map = new java.util.LinkedHashMap[K, V](64, 0.75f, true)
  def get(k: K): V = map.get(k)
  def put(k: K, v: V): Unit = {
    val old = map.put(k, v)
    if (old != null) bytes -= sizeOf(k, old)
    bytes += sizeOf(k, v)
    val it = map.entrySet().iterator() // access-order: LRU first
    while (bytes > maxBytes && map.size() > 1) {
      val e = it.next()
      bytes -= sizeOf(e.getKey, e.getValue)
      it.remove()
    }
  }
  def size: Int = map.size()
  private[search] def heldBytes: Long = bytes
}

private[search] object BytesLru {
  /** Approximate retained bytes of one posting row (compressed streams +
    * block metadata + object overhead). */
  def rowBytes(r: PostingRow): Long =
    r.docBytes.length.toLong + r.tfBytes.length + 8L * r.blockLast.length +
      4L * (r.blockMaxTf.length + r.blockMinDl.length +
        r.blockDocOff.length + r.blockTfOff.length) + 64L

  def urlBytes(us: Array[String]): Long =
    us.foldLeft(16L)((a, u) => a + 2L * u.length + 48L)
}

/** Per-snapshot norm routing (plain data — serializable into executor
  * closures): classic single-field indexes score every term against the
  * segment's global doc-length table; multi-field indexes score each
  * field-tagged term against ITS field's table and avgdl (ES 7.4 per-field
  * similarity — the avgdl inputs come from SnapshotMeta.fieldStats), and
  * keyword fields score norms-disabled (null lens — see PostingIterator). */
private[search] final case class NormCtx(
    avgdl: Double,
    multiField: Boolean,
    fieldAvgdl: Map[String, Double],
    keywordFields: Set[String]) {
  /** (lens, avgdl) for one term. Every stored term of a multi-field index
    * is field-tagged by construction. */
  def select(term: String, segLens: SegLens): (Array[Int], Double) =
    if (!multiField) (segLens.global, avgdl)
    else {
      val i = term.indexOf(graft.index.IndexBuilder.FieldSep)
      val f = if (i < 0) "" else term.substring(0, i)
      if (keywordFields.contains(f)) (null, 1.0)
      else (segLens.byField(f), fieldAvgdl(f))
    }
}

/** One segment's doc-length tables: the global analyzed-total table plus,
  * for multi-field indexes, one rank-aligned table per analyzed field. */
private[search] final case class SegLens(
    global: Array[Int], byField: Map[String, Array[Int]])

/** Per-segment evaluation shared by the distributed and served paths. */
private[search] object BoolEval {

  def scoreSegment(
      segId: Int,
      rows: Seq[PostingRow],
      segLens: SegLens,
      dels: Seq[PostingRow],
      c: CompiledQuery,
      blockSize: Int,
      norms: NormCtx,
      k: Int,
      // external lower bound on the global kth-best score (Wand.topK docs)
      floor: Double = Double.NegativeInfinity,
      // search_after paging cursor (Wand.topK docs)
      after: SegHit = null): Iterator[(Long, Double, Int)] = {
    val byTerm = new scala.collection.mutable.HashMap[String, PostingRow]
    rows.foreach(r => byTerm.update(r.term, r))
    // a segment missing any required term cannot match
    var i = 0
    while (i < c.must.length) {
      if (!byTerm.contains(c.must(i))) return Iterator.empty; i += 1
    }
    i = 0
    while (i < c.filter.length) {
      if (!byTerm.contains(c.filter(i))) return Iterator.empty; i += 1
    }
    val ids: Array[Long] =
      if (!c.hasIds) null
      else c.idsBySeg.getOrElse(segId, return Iterator.empty)

    // ONE cursor per term, shared across the required/scoring/excluded
    // roles: a must term otherwise decompresses its posting list twice per
    // segment per query. Sharing is sound because every per-candidate
    // access seeks the SAME target and PostingIterator.seek is a no-op
    // when curDoc >= target (forward-only) — the role arrays only ever
    // converge a shared cursor, never need it in two places.
    val iterMemo = new scala.collection.mutable.HashMap[String, PostingIterator]
    def iter(t: String): PostingIterator = iterMemo.getOrElseUpdate(t, {
      val (lensArr, avg) = norms.select(t, segLens)
      val it = new PostingIterator(byTerm(t), c.idf.getOrElse(t, 0.0),
        blockSize, avg, lensArr)
      it.start()
      it
    })
    val scoring = c.scoringTerms.filter(byTerm.contains).map(iter)
    // tombstoned docs (Deletes) are zero-idf exclusion cursors — the same
    // veto machinery as mustNot, so WAND/conjunction pruning stays exact
    val excluded = c.mustNot.filter(byTerm.contains).map(iter) ++
      dels.map { r =>
        val d = new PostingIterator(r, 0.0, blockSize, 1.0, null)
        d.start()
        d
      }
    val hits =
      if (c.hasRequired)
        BooleanScorer.conjunctiveTopK((c.must ++ c.filter).map(iter), scoring,
          excluded, ids, IndexBuilder.segBase(segId), k, floor,
          after)
      else if (scoring.isEmpty) Array.empty[SegHit]
      else Wand.topK(scoring, k, excluded, floor, after)
    hits.iterator.map(h => (h.docId, h.score, segId))
  }
}

/** Match ENUMERATION (no scoring, no top-k) for delete-by-query: every
  * live docId of one segment matching a compiled query, ascending. The
  * cursors walk exactly like the scorers' (leapfrog conjunction for
  * required clauses, k-way union for pure-should, ids allowlist) but emit
  * ALL matches lazily — nothing is ranked, heaped, or collected, so the
  * tombstone sink can stream corpus-sized match sets segment-parallel. */
private[graft] object MatchEnum {

  def enumerate(
      segId: Int,
      rows: Seq[PostingRow],
      dels: Seq[PostingRow],
      c: CompiledQuery,
      blockSize: Int): Iterator[Long] = {
    val byTerm = new scala.collection.mutable.HashMap[String, PostingRow]
    rows.foreach(r => byTerm.update(r.term, r))
    var i = 0
    while (i < c.must.length) {
      if (!byTerm.contains(c.must(i))) return Iterator.empty; i += 1
    }
    i = 0
    while (i < c.filter.length) {
      if (!byTerm.contains(c.filter(i))) return Iterator.empty; i += 1
    }
    val ids: Array[Long] =
      if (!c.hasIds) null
      else c.idsBySeg.getOrElse(segId, return Iterator.empty)

    // idf/avgdl/lens are irrelevant without scoring — cursors only navigate
    def iter(t: String): PostingIterator = {
      val it = new PostingIterator(byTerm(t), 0.0, blockSize, 1.0, null)
      it.start()
      it
    }
    val excluded = c.mustNot.filter(byTerm.contains).map(iter) ++
      dels.map { r =>
        val d = new PostingIterator(r, 0.0, blockSize, 1.0, null)
        d.start()
        d
      }
    def notExcluded(doc: Long): Boolean = {
      var e = 0
      var veto = false
      while (e < excluded.length) {
        excluded(e).seek(doc) // candidates ascend — forward-only seeks
        if (excluded(e).curDoc == doc) veto = true
        e += 1
      }
      !veto
    }

    val required = (c.must ++ c.filter).map(iter)
    if (required.nonEmpty) {
      // leapfrog conjunction emitting every aligned candidate
      new Iterator[Long] {
        // idsPos MUST be declared before nextDoc: the nextDoc initializer
        // runs advanceFrom, which advances idsPos — declaring idsPos after
        // would zero it back out and force a redundant O(|ids|) re-scan
        private var idsPos = 0
        private var nextDoc = advanceFrom(IndexBuilder.segBase(segId) + 1)
        private def advanceFrom(start: Long): Long = {
          var candidate = start
          while (true) {
            if (ids != null) {
              while (idsPos < ids.length && ids(idsPos) < candidate) idsPos += 1
              if (idsPos == ids.length) return -1L
              candidate = ids(idsPos)
            }
            var maxReq = candidate
            var i = 0
            while (i < required.length) {
              val r = required(i)
              r.seek(candidate)
              if (r.exhausted) return -1L
              if (r.curDoc > maxReq) maxReq = r.curDoc
              i += 1
            }
            if (maxReq > candidate) candidate = maxReq // realign
            else if (notExcluded(candidate)) return candidate
            else candidate += 1
          }
          -1L
        }
        def hasNext: Boolean = nextDoc >= 0
        def next(): Long = { val d = nextDoc; nextDoc = advanceFrom(d + 1); d }
      }
    } else if (ids != null) {
      ids.iterator.filter(notExcluded)
    } else {
      // pure-should: union of the scoring cursors' docs
      val cursors = c.scoringTerms.filter(byTerm.contains).map(iter)
      if (cursors.isEmpty) return Iterator.empty
      new Iterator[Long] {
        private var nextDoc = advance()
        private def advance(): Long = {
          while (true) {
            var min = Long.MaxValue
            var i = 0
            while (i < cursors.length) {
              if (cursors(i).curDoc < min) min = cursors(i).curDoc
              i += 1
            }
            if (min == Long.MaxValue) return -1L
            i = 0
            while (i < cursors.length) {
              if (cursors(i).curDoc == min) cursors(i).next()
              i += 1
            }
            if (notExcluded(min)) return min
          }
          -1L
        }
        def hasNext: Boolean = nextDoc >= 0
        def next(): Long = { val d = nextDoc; nextDoc = advance(); d }
      }
    }
  }

  /** k-way merge of strictly-ascending sorted Long iterators with dedup
    * (prior tombstone rows may overlap each other; matches are disjoint
    * from them by construction). Streaming — O(k) state. */
  def mergeDistinct(sources: Seq[Iterator[Long]]): Iterator[Long] = {
    val its = sources.map(_.buffered)
    new Iterator[Long] {
      def hasNext: Boolean = its.exists(_.hasNext)
      def next(): Long = {
        var min = Long.MaxValue
        its.foreach(it => if (it.hasNext && it.head < min) min = it.head)
        its.foreach(it => while (it.hasNext && it.head == min) it.next())
        min
      }
    }
  }
}

/** A queryable snapshot. With `warm = true` the posting table is
  * re-clustered by segment and persisted in executor memory, and the term
  * dictionary is collected to a driver map (bounded by `dictLimit`), so a
  * steady-state query is ONE shuffle-free Spark job: filter the cached
  * postings (predicate pushdown / in-memory batch pruning on `term`) ->
  * per-partition scoring over the colocated segments -> global
  * TakeOrderedAndProject. The cold path (warm = false) reads parquet
  * directly and probes the dictionary with a pushed-down filter instead. */
final class IndexHandle(spark: SparkSession, indexDir: String, warm: Boolean = true,
    dictLimit: Long = 2000000,
    // time travel: pin the handle to a specific committed snapshot id
    // instead of LATEST (Iceberg `VERSION AS OF`); readers holding a pinned
    // handle are isolated from concurrent append/delete/upsert commits,
    // whose data dirs stay readable until a vacuum
    snapshotId: Option[Int] = None,
    // warm-cache task granularity: how many partitions the cached posting
    // table is clustered into. Default = min(totalSegments,
    // spark.sql.shuffle.partitions / 2): per-query scoring tasks are
    // short, so halving the task count halves the per-query scheduling
    // floor while keeping the cores busy — measured on a 2M-doc/256-seg
    // index at local[32], 32 -> 16 partitions cut warm p50 from ~128 to
    // ~80 ms (tools/LatencyProbe). Per-partition grouping in the query
    // path is correct at ANY value (segments never split across
    // partitions).
    warmPartitions: Option[Int] = None,
    // in-memory columnar batch size used for the warm posting cache.
    // Posting rows carry multi-KB..MB compressed blobs, and a cached batch
    // decompresses WHOLESALE when any of its rows match — at the default
    // 10k rows/batch a 3-term query decodes tens of MB per touched batch
    // for three needed rows. 1k keeps batch decode proportional to what
    // the query reads and tightens min/max term pruning 10x (measured
    // ~214 -> ~128 ms p50 at 32 partitions, LatencyProbe).
    //
    // Standard Spark cache-sharing caveat, stated so the knobs don't
    // overpromise: two warm handles on the same index + session +
    // partition count produce the SAME logical plan, so the second reuses
    // the first's cache — its cacheBatchSize is then a no-op (different
    // warmPartitions values do split caches), and close() on EITHER
    // handle unpersists the shared cache for both. One warm handle per
    // (session, index) is the intended deployment (LatencyProbe restarts
    // the session per probe for exactly this reason).
    cacheBatchSize: Int = 1000) {
  import spark.implicits._

  val snap: SnapshotMeta = snapshotId
    .map(i => Snapshot.at(indexDir, i).getOrElse(
      throw new IllegalStateException(s"no snapshot $i under $indexDir")))
    .getOrElse(Snapshot.latest(indexDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot under $indexDir")))
  require(snap.isComplete,
    s"index incomplete: ${snap.segments.size}/${snap.numSegments} segments")

  private val dataPaths = snap.dataDirs.map(d => s"$indexDir/$d")
  private val avgdl = snap.avgdl
  private val blockSize = snap.blockSize
  // per-field norm routing (multi-field indexes score each field with its
  // own dl/avgdl, keyword fields norms-disabled — ES per-field similarity)
  private val fieldLensTerms: Seq[String] = snap.fieldDefs.filterNot(_.keyword)
    .map(f => IndexBuilder.FieldLensPrefix + f.name)
  private val normCtx = NormCtx(avgdl, snap.fieldDefs.nonEmpty,
    snap.fieldAvgdl, snap.fieldDefs.filter(_.keyword).map(_.name).toSet)

  private val termdict: DataFrame =
    spark.read.parquet(s"$indexDir/${snap.termdictDir.get}")
  // driver-side dictionary for warm handles on sane vocabularies. The
  // admission gate must bound the quantity actually collected (DISTINCT
  // terms) BEFORE the collect — gating on the per-segment term-count sum
  // admits up to dictLimit x P rows when the vocabulary is mostly
  // segment-local (Zipf tail), a driver OOM. The distinct-term count is
  // persisted in the snapshot at termdict-write time, so a warm open
  // issues no count() job (it was metadata-cheap but still one Spark job
  // per handle); the count() fallback only covers snapshots that somehow
  // carry a termdict without the recorded count.
  // test hook: true iff the admission gate had to fall back to a count()
  // job (should never happen for complete v2 snapshots — the count is
  // persisted at termdict-write time; ChunkedMarkerSpec asserts this)
  private[graft] var usedTermdictCountFallback = false
  private val driverDict: Option[Map[String, Long]] = {
    def termCount =
      if (snap.termdictRows >= 0) snap.termdictRows
      else { usedTermdictCountFallback = true; termdict.count() }
    if (warm && termCount <= dictLimit) {
      Some(termdict.select("term", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    } else None
  }

  private val postings: Dataset[PostingRow] = {
    val ds = spark.read.parquet(dataPaths: _*).as[PostingRow]
    if (warm) {
      // cluster by segment (query path then needs no exchange) and sort by
      // term within partitions: the in-memory columnar cache keeps min/max
      // stats per batch, so the per-query term filter prunes whole batches
      // instead of decompressing every posting blob
      // derive the default from shuffle.partitions (stable, user-tunable),
      // NOT defaultParallelism — under dynamic allocation the latter can
      // read 2 before executors register and would collapse the cache to
      // one partition for the handle's lifetime
      val parts = warmPartitions.getOrElse(math.max(1, math.min(
        snap.numSegments * snap.generations,
        spark.sessionState.conf.numShufflePartitions / 2)))
      // the batch-size conf is read when the InMemoryRelation is built;
      // set it for this cache only and restore right after
      // materialization. The save/set/restore triple is serialized by a
      // JVM-global lock: two handles interleaving would otherwise restore
      // each other's TEMPORARY value into the session permanently.
      Searcher.cacheBuildLock.synchronized {
        val key = "spark.sql.inMemoryColumnarStorage.batchSize"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, cacheBatchSize.toString)
        try {
          val c = ds.repartition(parts, col("segId"))
            .sortWithinPartitions("term", "segId").cache()
          c.count()
          c
        } finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    } else ds
  }

  // warm handles memoize decoded url CHUNKS on the driver: the second
  // per-query Spark job disappears once the chunks a segment's winners
  // land in have been seen. BYTE-budgeted LRU (like the other driver
  // caches): url tables are the LARGEST per-segment artifact (one String
  // per document), and a count cap never binds on a few-big-segments
  // index — the map would grow toward the whole corpus's url bytes on a
  // long-lived handle answering lookups across every segment.
  private val urlCache =
    new BytesLru[(Int, Int), Array[String]](512L << 20,
      (_, v) => BytesLru.urlBytes(v))

  // per-url ids-resolution memo: url -> (segId, docId) per generation it
  // exists in (empty = absent, negative-cached against the pinned
  // snapshot). The entry weight counts the url KEY too — it DOMINATES a
  // negative entry (empty array), and a long-lived handle probing
  // millions of distinct mostly-absent urls must be bounded by what the
  // map actually retains, not by result bytes alone.
  private val idsCache =
    new BytesLru[String, Array[(Int, Long)]](64L << 20,
      (u, arr) => 96L + 2L * u.length + 24L * arr.length)

  // served path: hot posting rows + doc-length tables memoized on the
  // driver (bounded LRU), so repeated-term queries never touch the cluster
  // — the role the reference's LRU-cached ES lookups play
  // (mrtarget/common/LookupTables.py:54-142). Cold terms cost one filtered
  // Spark fetch; everything after is local WAND over all segments.
  private val postingCache =
    new BytesLru[String, Array[PostingRow]](1024L << 20,
      (t, rs) => rs.foldLeft(16L + 2L * t.length)((a, r) =>
        a + BytesLru.rowBytes(r)))
  // per-segment doc-length tables + tombstone rows are fetched per candidate
  // segment and LRU-bounded: an all-segments eager collect would hold
  // O(numDocs) ints on the driver forever — GBs at 10⁹ docs. The
  // distributed path never touches this.
  private val segCache =
    new BytesLru[Int, (SegLens, Seq[PostingRow])](512L << 20,
      { case (_, (sl, dels)) =>
        4L * sl.global.length +
          sl.byField.valuesIterator.map(4L * _.length).sum +
          dels.iterator.map(BytesLru.rowBytes).sum + 64L
      })

  // Each cache has its own lock, and NEITHER lock is held across a Spark
  // fetch: a cold term/segment must not serialize the concurrent hot
  // queries that the served path exists for (a racing double-fetch of the
  // same key is benign — both compute identical rows from the pinned
  // snapshot, last install wins).
  private val segLock = new Object
  private val postingLock = new Object

  /** One home for the served path's LRU-fetch discipline (all three
    * driver caches): collect hits under the lock, fetch ONLY the missing
    * keys from Spark with NO lock held, install under the lock, return
    * hits ++ filled. `absent` fills keys the fetch did not return;
    * `cacheAbsent` decides whether those fills are negative-cached
    * (terms: yes — the pinned snapshot cannot grow one later; url
    * tables: no). Keeping the pattern in one place pins the
    * no-lock-across-Spark-fetch rule once instead of three times. */
  private def cachedFetch[K, V](cache: BytesLru[K, V], lock: AnyRef,
      keys: Seq[K])(fetchMissing: Seq[K] => Map[K, V],
      absent: Option[K => V] = None,
      cacheAbsent: Boolean = true): Map[K, V] = {
    val hit = lock.synchronized {
      keys.flatMap(k => Option(cache.get(k)).map(k -> _)).toMap
    }
    val missing = keys.filterNot(hit.contains)
    if (missing.isEmpty) hit
    else {
      val fetched = fetchMissing(missing)
      val filled: Map[K, V] = absent match {
        case Some(d) =>
          missing.iterator.map(k => k -> fetched.getOrElse(k, d(k))).toMap
        case None => fetched
      }
      val toInstall = if (cacheAbsent) filled else fetched
      lock.synchronized(toInstall.foreach { case (k, v) => cache.put(k, v) })
      hit ++ filled
    }
  }

  private def fetchLens(segs: Seq[Int]): Map[Int, (SegLens, Seq[PostingRow])] =
    cachedFetch(segCache, segLock, segs) { missing =>
      val wantedMarkers = IndexBuilder.TermLens +: IndexBuilder.TermDels +:
        fieldLensTerms
      postings.filter(
          col("term").isin(wantedMarkers: _*) &&
          col("segId").isin(missing: _*))
        .collect().groupBy(_.segId)
        .map { case (s, rows) =>
          // doc-length tables are block-chunked (format v2) — concat in
          // chunk order; field tables keyed by (unprefixed) field name
          val lens = IndexBuilder.concatLens(
            rows.filter(_.term == IndexBuilder.TermLens).toSeq)
          val byField = rows
            .filter(r => r.term.nonEmpty &&
              r.term.charAt(0) == IndexBuilder.FieldLensPrefix.charAt(0))
            .groupBy(_.term).map { case (t, rs) =>
              t.substring(1) -> IndexBuilder.concatLens(rs.toSeq)
            }
          s -> (SegLens(lens, byField),
            rows.filter(_.term == IndexBuilder.TermDels).toSeq)
        }
    }

  /** Test hook: current number of cached per-segment doc-length tables. */
  private[graft] def lensCacheSize: Int = segLock.synchronized(segCache.size)

  private def fetchPostings(terms: Seq[String]): Map[String, Array[PostingRow]] =
    cachedFetch(postingCache, postingLock, terms)(
      missing =>
        postings.filter(col("term").isin(missing: _*)).collect()
          .groupBy(_.term),
      // absent terms cache an empty list too — the pinned snapshot cannot
      // grow one later, and refetching a hot absent term every query would
      // be a per-query Spark job
      absent = Some(_ => Array.empty[PostingRow]))

  /** Fetch (and memoize, LRU) decoded url CHUNKS keyed (segId, chunk) —
    * never a whole segment's table: at the documented segment sizing
    * (10^8 docs) a full url table is multi-GB of driver strings, while a
    * chunk is bounded by markerChunkDocs regardless of segment size (the
    * point of the block-chunked v2 marker format). The result map holds
    * strong references, so entries evicted between calls are simply
    * refetched — never observed half-missing. Absent chunks resolve
    * empty but are deliberately NOT negative-cached. */
  private def urlChunks(keys: Seq[(Int, Int)])
      : Map[(Int, Int), Array[String]] =
    cachedFetch(urlCache, urlCache, keys.distinct)(
      missing => {
        // an OR of exact (segId, chunk) conjunctions — NOT the
        // (segId IN, chunk IN) cross product, whose superset rows (up to
        // |segs|×|chunks| multi-MB url blobs for k wanted cells) would
        // all cross to the driver before any post-filter could drop them.
        // BALANCED reduction: a left-deep reduce(_ || _) builds an OR tree
        // whose depth equals |missing|, and a large-k page touching many
        // chunks then pays analyzer recursion/optimization cost per level;
        // log-depth keeps the exact-pair semantics (and the parquet
        // pushdown of the OR-of-conjunctions) with a flat tree.
        def orTree(ps: IndexedSeq[org.apache.spark.sql.Column])
            : org.apache.spark.sql.Column =
          if (ps.length == 1) ps.head
          else {
            val (l, r) = ps.splitAt(ps.length / 2)
            orTree(l) || orTree(r)
          }
        val pred = orTree(missing.toIndexedSeq.map { case (s, ch) =>
          col("segId") === s && col("chunk") === ch
        })
        postings
          .filter(col("term") === IndexBuilder.TermUrls && pred)
          .collect().iterator
          .map(r => (r.segId, r.chunk) -> Varint.decodeStrings(r.tfBytes))
          .toMap
      },
      absent = Some(_ => Array.empty[String]),
      cacheAbsent = false)

  /** Decorate scored rows with urls: rank -> (chunk ordinal, offset) via
    * the chunking invariant (chunk c starts at rank c*markerChunkDocs),
    * fetching only the chunks the k winners land in. */
  private def decorateHits(rows: Array[(Long, Double, Int)]): Array[Hit] = {
    val chunkDocs = snap.markerChunkDocs
    val keys = rows.map { case (d, _, s) =>
      (s, ((d - IndexBuilder.segBase(s) - 1) / chunkDocs).toInt)
    }.toSeq
    val chunks = urlChunks(keys)
    rows.zipWithIndex.map { case ((docId, score, seg), i) =>
      val rank = docId - IndexBuilder.segBase(seg) - 1
      val tab = chunks((seg, (rank / chunkDocs).toInt))
      Hit(i + 1, docId, tab((rank % chunkDocs).toInt), score)
    }
  }

  // per-term df memo for handles WITHOUT the full driver dictionary: df
  // against the pinned snapshot is immutable, so a repeated term (paging
  // cursors re-compile the same query per page; a served handle re-probes
  // its hot terms) never re-runs the termdict probe job. Absent terms
  // negative-cache as None — the snapshot cannot grow one later.
  private val dictCache =
    new BytesLru[String, Option[Long]](8L << 20, (t, _) => 48L + 2L * t.length)
  private val dictLock = new Object

  private def dictDf(terms: Seq[String]): Map[String, Long] = driverDict match {
    case Some(m) => terms.iterator.flatMap(t => m.get(t).map(t -> _)).toMap
    case None =>
      if (terms.isEmpty) Map.empty
      else cachedFetch(dictCache, dictLock, terms)(
        missing => termdict.filter(col("term").isin(missing: _*))
          .select("term", "df").collect()
          .map(r => r.getString(0) -> Option(r.getLong(1))).toMap,
        absent = Some(_ => None))
        .collect { case (t, Some(df)) => t -> df }
  }

  /** ids (urls) -> per-segment sorted docIds, resolved EXECUTOR-side: each
    * url chunk of the candidate segments binary-searches the probe urls
    * that hash to its segment (seg-local rank IS the url sort position,
    * and chunk c holds ranks [c*markerChunkDocs, (c+1)*markerChunkDocs)),
    * so only (segId, docId) pairs — bounded by the probe list — cross to
    * the driver. The whole-table driver fetch this replaces decoded every
    * candidate segment's url table into driver memory (multi-GB at the
    * documented 10^8-doc segment sizing) to answer a handful of probes.
    * A url may exist in one segment per generation; all generations are
    * probed. Tombstoned urls still resolve — their docIds are vetoed at
    * scoring time, and [[graft.index.Deletes]] uses this to find the
    * docIds to tombstone. */
  private[graft] def resolveDocIds(urls: Seq[String]): Map[Int, Array[Long]] = {
    if (urls.isEmpty) return Map.empty
    val resolved = cachedFetch(idsCache, idsCache, urls.distinct)(
      missing => resolveUncached(missing),
      // the handle pins its snapshot, so an absent url stays absent —
      // negative-cache it (same argument as fetchPostings), making
      // repeated ids lookups job-free (the S10 LRU point-lookup surface)
      absent = Some(_ => Array.empty[(Int, Long)]))
    resolved.valuesIterator.flatten.toArray
      .groupBy(_._1).map { case (s, arr) => s -> arr.map(_._2).sorted }
  }

  /** The Spark job behind [[resolveDocIds]], for urls not in the LRU. */
  private def resolveUncached(urls: Seq[String])
      : Map[String, Array[(Int, Long)]] = {
    import spark.implicits._
    val P = snap.numSegments
    val gens = snap.generations
    val chunkDocs = snap.markerChunkDocs
    // task-closure probe map, bounded by the caller's url list
    val probes: Map[Int, Array[String]] =
      urls.groupBy(u => Hashing.segmentOf(u, P))
        .map { case (s0, us) => s0 -> us.toArray }
    val segs = probes.keys.flatMap(s0 => (0 until gens).map(_ * P + s0)).toSeq
    val found = postings
      .filter(col("term") === IndexBuilder.TermUrls &&
        col("segId").isin(segs: _*))
      .mapPartitions { it =>
        it.flatMap { r =>
          val targets = probes.getOrElse(r.segId % P, Array.empty[String])
          // range precheck against the chunk's (first, last) urls — a
          // prefix walk, two String allocations — so only the ONE chunk
          // per segment that can bracket a probe pays the full decode
          // (2^20 String allocations); a point lookup against a 10^8-doc
          // segment otherwise decodes ~100 chunks to run ~20 comparisons
          val inRange =
            if (targets.isEmpty) targets
            else Varint.firstLastStrings(r.tfBytes) match {
              case None => Array.empty[String]
              case Some((first, last)) => targets.filter(u =>
                OracleSearch.utf8Compare(u, first) >= 0 &&
                OracleSearch.utf8Compare(u, last) <= 0)
            }
          if (inRange.isEmpty) Iterator.empty
          else {
            val tab = Varint.decodeStrings(r.tfBytes)
            val base =
              IndexBuilder.segBase(r.segId) + r.chunk.toLong * chunkDocs
            inRange.iterator.flatMap { u =>
              val idx = Searcher.binarySearchUtf8(tab, u)
              if (idx >= 0) Iterator.single((u, r.segId, base + idx + 1))
              else Iterator.empty
            }
          }
        }
      }.collect()
    found.groupBy(_._1)
      .map { case (u, arr) => u -> arr.map(t => (t._2, t._3)) }
  }

  /** Compile against this snapshot; None = provably-empty result. */
  private def compile(q0: BoolQuery): Option[CompiledQuery] = {
    val qn = q0.normalized
    if (qn.contradictory) return None
    // the index stores marker-colliding tokens behind the safeTerm escape
    // (IndexBuilder.safeTerm) — map clause terms identically so matching
    // semantics are the injective image of the unmapped ones
    val q = qn.copy(
      must = qn.must.map(IndexBuilder.safeTerm),
      should = qn.should.map(IndexBuilder.safeTerm),
      filter = qn.filter.map(IndexBuilder.safeTerm),
      mustNot = qn.mustNot.map(IndexBuilder.safeTerm))
    val df = dictDf((q.must ++ q.should ++ q.filter ++ q.mustNot).distinct)
    if (q.must.exists(!df.contains(_)) || q.filter.exists(!df.contains(_)))
      return None // conjunction over an absent term
    val scoring = (q.must ++ q.should.filter(df.contains)).distinct.sorted.toArray
    if (!q.hasRequired && scoring.isEmpty) return None
    val idsBySeg = q.ids match {
      case None => Map.empty[Int, Array[Long]]
      case Some(urls) =>
        val m = resolveDocIds(urls)
        if (m.isEmpty) return None // no listed id exists in the index
        m
    }
    Some(CompiledQuery(q.must.toArray, q.filter.toArray,
      q.mustNot.filter(df.contains).toArray, scoring,
      scoring.map(t => t -> Bm25.idf(snap.numDocs, df(t))).toMap,
      q.ids.isDefined, idsBySeg))
  }

  /** Free-text top-k (ES `match`): pure-should over the analyzed terms. */
  def topK(query: String, k: Int): Array[Hit] =
    search(BoolQuery.text(query), k)

  /** Hot-serving free-text top-k — rank-identical to `topK` (same scorer,
    * same ascending-term evaluation, same (score desc, docId asc) merge),
    * but segments are scored sequentially on the driver from memoized
    * postings. */
  def servedTopK(query: String, k: Int): Array[Hit] =
    servedSearch(BoolQuery.text(query), k)

  /** Distributed bool-query top-k over the snapshot. */
  def search(q: BoolQuery, k: Int): Array[Hit] = searchAfter(q, k, None)

  /** Deep paging (ES search_after; the reference pages query-filtered
    * result sets with scroll='4h'/size=1000, modules/Association.py:
    * 309-311): `after` = (score, docId) of the LAST hit of the previous
    * page, and the result is the next k hits strictly after that position
    * under the global (score desc, docId asc) order — every segment's
    * scorer applies the cursor as an upper-bound filter while its own
    * heap theta keeps the usual WAND/conjunction pruning, so page N+1
    * costs one top-k pass, never a recompute with k' = (N+1)*k. Scores
    * are deterministic across calls (pinned float order), so the cursor's
    * equality tie-break is exact. Ranks restart at 1 per page. */
  def searchAfter(q: BoolQuery, k: Int,
      after: Option[(Double, Long)]): Array[Hit] = {
    val rows = searchRaw(q, k, after)
    if (rows.isEmpty) return Array.empty
    decorateHits(rows)
  }

  /** [[search]] without url resolution: (docId, score, segId) rows —
    * top-k-bounded (corpus-sized match enumeration lives in
    * [[matchTombstoneRows]], which never collects). */
  private[graft] def searchRaw(q: BoolQuery, k: Int,
      after: Option[(Double, Long)] = None): Array[(Long, Double, Int)] = {
    val c = compile(q) match {
      case None => return Array.empty
      case Some(x) => x
    }
    val kk = k
    val bs = blockSize
    val aft: SegHit = SegHit.fromCursor(after)
    val nc = normCtx // local copy — the closure must not capture the handle
    val wanted: Seq[String] =
      (IndexBuilder.TermLens +: IndexBuilder.TermDels +: fieldLensTerms) ++
        c.allTerms.toSeq

    def evalRows(rowsIt: Iterator[PostingRow]): Iterator[(Long, Double, Int)] = {
      val lensRows = scala.collection.mutable.HashMap
        .empty[Int, ArrayBuffer[PostingRow]]
      val fieldRows = scala.collection.mutable.HashMap
        .empty[Int, ArrayBuffer[PostingRow]]
      val delsFor = scala.collection.mutable.HashMap
        .empty[Int, ArrayBuffer[PostingRow]]
      val posting = scala.collection.mutable.LinkedHashMap
        .empty[Int, ArrayBuffer[PostingRow]]
      rowsIt.foreach { r =>
        if (r.term == IndexBuilder.TermLens)
          lensRows.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r
        else if (r.term.nonEmpty &&
            r.term.charAt(0) == IndexBuilder.FieldLensPrefix.charAt(0))
          fieldRows.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r
        else if (r.term == IndexBuilder.TermDels)
          delsFor.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r
        else posting.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r
      }
      // an ids query must evaluate its segments even when no clause term has
      // a posting row there (e.g. pure-ids, or ids + mustNot-only); those
      // segments are identified by their doc-length marker rows instead
      val segIds: Iterator[Int] =
        if (c.hasIds) lensRows.keysIterator.filter(c.idsBySeg.contains)
        else posting.keysIterator
      segIds.flatMap { segId =>
        lensRows.get(segId) match {
          case None => Iterator.empty
          case Some(rows) =>
            val byField = fieldRows.get(segId)
              .map(_.groupBy(_.term).map { case (t, rs) =>
                t.substring(1) -> IndexBuilder.concatLens(rs.toSeq)
              })
              .getOrElse(Map.empty[String, Array[Int]])
            BoolEval.scoreSegment(segId,
              posting.get(segId).map(_.toSeq).getOrElse(Nil),
              SegLens(IndexBuilder.concatLens(rows.toSeq), byField),
              delsFor.get(segId).map(_.toSeq).getOrElse(Nil), c, bs, nc, kk,
              after = aft)
        }
      }
    }

    val byTerm = postings.filter(col("term").isin(wanted: _*))
    // an ids clause pins the candidate segments — prune the scan to them.
    // The COLD path prunes term queries to candidate segments too (the
    // (term, segId) pre-scan countMatches/matchesDF already pay):
    // groupByKey would otherwise shuffle EVERY segment's doc-length and
    // field-lens marker rows — O(corpus) varint bytes — into groups that
    // evalRows discards for segments holding no clause posting row. The
    // warm path groups per cached partition with ZERO exchanges, so a
    // pre-scan job there would only add per-query scheduling latency.
    val filtered =
      if (c.hasIds) byTerm.filter(col("segId").isin(c.idsBySeg.keys.toSeq: _*))
      else if (!warm) {
        val cand = candidateSegs(c)
        if (cand.isEmpty) return Array.empty
        byTerm.filter(col("segId").isin(cand: _*))
      } else byTerm
    // warm: the cache is explicitly clustered by segId, so per-partition
    // local grouping is safe and the query runs with ZERO exchanges.
    // cold: parquet splits can fragment a segment across tasks, so group
    // by key (the shuffle moves only the filtered posting rows).
    val scoredDs =
      if (warm) filtered.mapPartitions(evalRows)
      else filtered.groupByKey(_.segId)
        .flatMapGroups((_: Int, it: Iterator[PostingRow]) => evalRows(it))
    scoredDs
      .toDF("docId", "score", "segId")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
  }

  /** Distributed match-enumeration sink (ES delete-by-query at corpus
    * scale): one CONSOLIDATED TermDels row per segment with >= 1 NEW match
    * — prior tombstones of that segment merged in (streaming k-way merge;
    * exclusion cursors already keep dead docs out of the match set). The
    * match set never touches the driver: enumeration, merge and varint
    * encode all happen inside the per-segment task, and the returned
    * Dataset is written straight to the tombstone dir. Segments with no
    * new match emit nothing (their prior rows stay referenced in the old
    * data dirs). */
  /** Shared preamble of the three match-enumeration surfaces
    * (matchTombstoneRows / countMatches / matchesDF): compile, candidate
    * -segment prune, marker-aware shuffled-term list, and the
    * per-segment split into (streamed marker rows, tombstone rows,
    * positive term rows) handed to `body` with the compiled query and
    * block size.
    *
    * The marker invariant lives HERE, once: TermLens rides along ONLY
    * for pure-ids queries with no other anchor (it guarantees rows
    * per candidate segment when no clause term has a posting row there);
    * for term queries every candidate segment has a positive posting row
    * to anchor on, and including TermLens would shuffle every candidate
    * segment's doc-length rows — O(corpus) bytes — into sinks that never
    * read lengths. A surface that ships its own always-present marker
    * (matchesDF's TermUrls) passes it as `extraMarker` and anchors on
    * that instead. The candidate prune keeps non-matching segments' url
    * tables and (post-mass-delete, corpus-sized) tombstone rows from
    * moving at all. Returns None when the query cannot match.
    *
    * Memory contract: tombstone and query-term posting rows are buffered
    * per segment (the cursor machinery needs them up front; both are
    * bounded — compressed tombstones and the QUERY's terms, not the
    * segment). The extraMarker rows — the segment's DOMINANT bytes (one
    * url per document) — are NEVER buffered: the partition sort puts
    * them after the buffered classes in chunk order, and `body` receives
    * them as a streaming iterator, one chunk row referenced at a time
    * (the groupByKey/toSeq shape this replaces pinned a whole segment's
    * url table per task — multi-GB at the documented 10^8-doc sizing). */
  private def enumeratePerSegment[T](q: BoolQuery, extraMarker: Option[String])(
      body: (CompiledQuery, Int, Int, Iterator[PostingRow], Seq[PostingRow],
        Seq[PostingRow]) => Iterator[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Option[Dataset[T]] = {
    import spark.implicits._
    val c = compile(q) match {
      case None => return None
      case Some(x) => x
    }
    val cand = candidateSegs(c)
    if (cand.isEmpty) return None
    val wanted: Seq[String] = extraMarker.toSeq ++
      (if (c.hasIds && extraMarker.isEmpty) Seq(IndexBuilder.TermLens)
       else Nil) ++
      (IndexBuilder.TermDels +: c.allTerms.toSeq)
    val bs = blockSize
    val marker = extraMarker
    val filtered = postings.filter(col("term").isin(wanted: _*) &&
      col("segId").isin(cand: _*))
    // the class column exists only when a marker rides along (a bare
    // lit(0) in ORDER BY would be read as ordinal position 0)
    val sortCols = col("segId") +: (marker.map(m =>
      when(col("term") === lit(m), lit(1)).otherwise(lit(0))).toSeq :+
      col("chunk"))
    val sorted = filtered
      .repartition(col("segId"))
      .sortWithinPartitions(sortCols: _*)
    Some(sorted.mapPartitions { it0 =>
      val it = it0.buffered
      def oneSeg(): Iterator[T] = {
        val segId = it.head.segId
        val dels = Seq.newBuilder[PostingRow]
        val terms = Seq.newBuilder[PostingRow]
        while (it.hasNext && it.head.segId == segId &&
            !marker.contains(it.head.term)) {
          val r = it.next()
          if (r.term == IndexBuilder.TermDels) dels += r
          else if (r.term != IndexBuilder.TermLens) terms += r
        }
        val markers: Iterator[PostingRow] = new Iterator[PostingRow] {
          def hasNext: Boolean = it.hasNext && it.head.segId == segId
          def next(): PostingRow = it.next()
        }
        body(c, segId, bs, markers, dels.result(), terms.result()) ++ {
          // body may finish before the last marker chunk (its match
          // stream ended early) — drain to the segment boundary so the
          // next group never starts mid-segment
          while (markers.hasNext) markers.next()
          Iterator.empty
        }
      }
      def all(): Iterator[T] =
        if (!it.hasNext) Iterator.empty else oneSeg() ++ all()
      all()
    })
  }

  private[graft] def matchTombstoneRows(q: BoolQuery): Dataset[PostingRow] = {
    import spark.implicits._
    enumeratePerSegment[PostingRow](q, extraMarker = None) {
      (c, segId, bs, _, dels, terms) =>
        val matches = MatchEnum.enumerate(segId, terms, dels, c, bs).buffered
        if (!matches.hasNext) Iterator.empty
        else {
          // prior tombstones stream off their compressed bytes
          // (IndexBuilder.docIdStream) — decodePostings would materialize
          // 8 bytes per previously-deleted doc in-task, an executor-OOM
          // risk right after a prior mass delete, exactly the workload
          // this sink exists for
          val merged = MatchEnum.mergeDistinct(
            matches +: dels.map(IndexBuilder.docIdStream))
          Iterator.single(IndexBuilder.encodeDocIdStream(segId, merged, bs))
        }
    }.getOrElse(spark.emptyDataset[PostingRow])
  }

  /** Segments that can possibly hold a match for `c`: those with at least
    * one positive-clause (must/filter/should) posting row — a match needs
    * every required term, and a pure-should match needs one scoring term,
    * so a segment with NO positive rows cannot contribute. Ids queries use
    * the resolved id segments instead. Bounds every enumeration shuffle:
    * url tables and (post-mass-delete, corpus-sized) tombstone rows of
    * non-candidate segments never move. The pre-scan reads only the
    * pushed-down (term, segId) columns and sends O(segments) ints to the
    * driver. */
  private def candidateSegs(c: CompiledQuery): Seq[Int] =
    if (c.hasIds) c.idsBySeg.keys.toSeq
    else {
      import spark.implicits._
      val pos = (c.must ++ c.filter ++ c.scoringTerms).distinct.toSeq
      if (pos.isEmpty) Seq.empty
      else if (snap.segments.size == 1)
        // a pre-scan cannot prune a single-segment index, and compile()
        // already proved every required term (and >= 1 scoring term for
        // pure-should) has df > 0 index-wide == in THE segment; skipping
        // the scan saves one Spark job per cold query (guide §1.2: remove
        // passes that compute nothing)
        snap.segments.map(_.segId)
      else postings.filter(col("term").isin(pos: _*))
        .select("segId").distinct().as[Int].collect().toSeq
    }

  /** Exact live-match count for `q` (the ES `track_total_hits=true` /
    * `Search.count()` contract, mrtarget/modules/SearchObjects.py:289,334):
    * each candidate segment enumerates its matches with the same cursor
    * machinery the scorers use (deleted docs are exclusion cursors) and
    * emits ONE Long — no scoring, no k, and only O(segments) counts cross
    * to the driver. */
  def countMatches(q: BoolQuery): Long = {
    import spark.implicits._
    enumeratePerSegment[Long](q, extraMarker = None) {
      (c, segId, bs, _, dels, terms) =>
        var n = 0L
        MatchEnum.enumerate(segId, terms, dels, c, bs).foreach(_ => n += 1)
        Iterator.single(n)
    } match {
      case None => 0L
      case Some(counts) =>
        counts.select(coalesce(sum(col("value")), lit(0L))).as[Long].head()
    }
  }

  /** ES scan-with-query (`Search().query(q).scan()` + scroll paging — the
    * reference walks query-filtered result sets for hours this way,
    * mrtarget/modules/Association.py:309-311): enumerate EVERY live match
    * of `q` as a DataFrame of (docId, url, segId) — no scoring, no k.
    * Each candidate segment enumerates its matches with the scorers'
    * cursor machinery (tombstones are exclusion cursors) and walks its
    * length-prefixed url table in rank lockstep — matches arrive in
    * ascending docId = ascending rank order, so the walk is a streaming
    * merge with O(1) state, never a materialized url array. The result
    * being a DataFrame is the point at scale: pageable, joinable,
    * writable — what the reference's scroll loops feed downstream. */
  def matchesDF(q: BoolQuery): DataFrame = {
    import spark.implicits._
    // TermUrls feeds the url walk AND anchors the group — every committed
    // segment carries one (even empty segments), so no TermLens rides
    // along even for ids queries (enumeratePerSegment's anchor rule)
    val chunkDocs = snap.markerChunkDocs
    enumeratePerSegment[(Long, String, Int)](q,
        extraMarker = Some(IndexBuilder.TermUrls)) {
      (c, segId, bs, markers, dels, terms) =>
        val segB = IndexBuilder.segBase(segId)
        // rank-lockstep walk over the STREAMED url chunks: matches ascend
        // and chunk rows arrive in ascending chunk order, so the walk
        // pulls forward chunk-by-chunk — chunks the match stream jumps
        // over are pulled but never decoded (chunk c starts at rank
        // c*chunkDocs, the chunking invariant), within a chunk
        // non-matching urls are skipped by length prefix, and only ONE
        // chunk's bytes are referenced at a time — O(1) state however
        // large the segment
        var cur: PostingRow = null
        var rd: Varint.Reader = null
        var rank = 0L
        MatchEnum.enumerate(segId, terms, dels, c, bs).map { d =>
          val want = d - segB - 1
          while (cur == null || want >= (cur.chunk + 1).toLong * chunkDocs) {
            require(markers.hasNext,
              s"url table of segment $segId ended before rank $want")
            cur = markers.next()
            rd = null
          }
          if (rd == null) {
            rd = new Varint.Reader(cur.tfBytes, 0)
            rank = cur.chunk.toLong * chunkDocs
          }
          while (rank < want) { // skip non-matching urls, streaming
            val len = rd.readInt(); rd.pos += len; rank += 1
          }
          val len = rd.readInt()
          val url = new String(cur.tfBytes, rd.pos, len,
            java.nio.charset.StandardCharsets.UTF_8)
          rd.pos += len; rank += 1
          (d, url, segId)
        }
    }.map(_.toDF("docId", "url", "segId")).getOrElse(
      spark.emptyDataset[(Long, String, Int)].toDF("docId", "url", "segId"))
  }

  /** Hot-serving bool-query top-k: rank-identical to `search`, evaluated on
    * the driver from the memoized posting/doc-length caches. */
  def servedSearch(q: BoolQuery, k: Int): Array[Hit] =
    servedSearchAfter(q, k, None)

  /** [[searchAfter]] on the hot-serving path — rank-identical paging from
    * the driver-memoized caches. */
  def servedSearchAfter(q: BoolQuery, k: Int,
      after: Option[(Double, Long)]): Array[Hit] = {
    val c = compile(q) match {
      case None => return Array.empty
      case Some(x) => x
    }
    val aft: SegHit = SegHit.fromCursor(after)
    val wantedTerms = c.allTerms.toSeq
    val rowsByTerm = fetchPostings(wantedTerms)

    val candSegs: Seq[Int] = {
      val base: Set[Int] =
        if (c.must.nonEmpty || c.filter.nonEmpty) {
          // intersect FROM the rarest required term's segments: the
          // working set is then bounded by the rarest term, and a hot
          // stopword-scale required term (rows in every segment)
          // contributes one iteration, never its own segments-sized Set
          // allocation per served query
          val req = (c.must ++ c.filter).distinct
            .map(t => rowsByTerm(t)).sortBy(_.length)
          req.tail.foldLeft(req.head.iterator.map(_.segId).toSet) {
            (cur, rows) => rows.iterator.map(_.segId).filter(cur).toSet
          }
        }
        else if (c.hasIds) c.idsBySeg.keySet
        else c.scoringTerms.iterator.flatMap(t => rowsByTerm(t).map(_.segId)).toSet
      (if (c.hasIds) base.intersect(c.idsBySeg.keySet) else base).toSeq.sorted
    }
    // only the candidate segments' doc-length/tombstone tables are pulled
    // (LRU-kept)
    val lens = fetchLens(candSegs)
    // one pass groups each term's rows by segment (term order preserved
    // within a segment — the scorer's float-accumulation order contract);
    // re-filtering every term's whole row array per segment would be
    // O(segments × total rows) per query
    val rowsBySeg = {
      val m = scala.collection.mutable.HashMap.empty[Int, ArrayBuffer[PostingRow]]
      wantedTerms.foreach { t =>
        rowsByTerm(t).foreach(r =>
          m.getOrElseUpdate(r.segId, ArrayBuffer.empty) += r)
      }
      m
    }
    // segments score independently; parallelize across driver cores (the
    // per-segment scorer state is private; merge order is pinned
    // afterwards). Finished segments publish their local kth-best score
    // into a shared floor — a monotone lower bound of the GLOBAL kth-best
    // (any superset's kth max >= a subset's kth max) — so later segments'
    // WAND/conjunction runs prune against it from the start. Serving cost
    // then stops scaling with segment count: after the first wave the
    // floor sits near the final theta and whole segments/blocks skip.
    val floorBits = new java.util.concurrent.atomic.AtomicLong(
      java.lang.Double.doubleToRawLongBits(Double.NegativeInfinity))
    def floorNow: Double = java.lang.Double.longBitsToDouble(floorBits.get())
    def raiseFloor(v: Double): Unit = {
      var cur = floorBits.get()
      while (v > java.lang.Double.longBitsToDouble(cur) &&
          !floorBits.compareAndSet(cur, java.lang.Double.doubleToRawLongBits(v)))
        cur = floorBits.get()
    }
    val hits = candSegs.par.flatMap { segId =>
      lens.get(segId) match {
        case None => Seq.empty
        case Some((l, dels)) =>
          val rows = rowsBySeg.get(segId).map(_.toSeq).getOrElse(Nil)
          val segHits = BoolEval.scoreSegment(segId, rows, l, dels, c,
            blockSize, normCtx, k, floorNow, aft).toSeq
          // k <= 0 yields empty segHits and lengthCompare(0) >= 0 —
          // guard nonEmpty or .min throws on the k=0 no-op query
          if (segHits.nonEmpty && segHits.lengthCompare(k) >= 0)
            raiseFloor(segHits.iterator.map(_._2).min)
          segHits
      }
    }.seq.toArray
    val top = hits.sortBy { case (docId, score, _) => (-score, docId) }.take(k)
    if (top.isEmpty) return Array.empty
    decorateHits(top)
  }

  /** Autocomplete over the snapshot's persisted suggest artifact (built at
    * index time when `IndexConfig.suggest` is on — the reference's
    * precomputed suggestion fields + ES completion query,
    * mrtarget/modules/SearchObjects.py:54-77,334-347): top-k terms
    * containing `fragment` (ngram semantics, 4..10 chars), ranked by
    * collection frequency desc then term asc. The probe is a pushed-down
    * parquet equality scan on the gram-sorted artifact — the same access
    * shape as a termdict probe; results are memoized per fragment
    * (LRU-bounded) so a hot prefix never re-touches the cluster. */
  def suggest(fragment: String, k: Int): Array[(String, Long)] = {
    require(snap.suggestDir.isDefined,
      "this snapshot has no suggest artifact - build with IndexConfig(suggest = true)")
    // Locale.ROOT like Analyzer.tokenize — the default locale would fold
    // differently (tr_TR dotless-i) and miss grams the artifact holds
    val key = fragment.toLowerCase(java.util.Locale.ROOT)
    if (key.length < 4 || key.length > 10) return Array.empty
    suggestMemo(key, k)
  }

  /** DOC-level autocomplete over the snapshot's doc-suggest artifact
    * (IndexConfig.docSuggestFields — the reference's per-document
    * suggestion inputs + ES completion suggester returning ranked
    * documents, mrtarget/modules/SearchObjects.py:54-77,334-347): top-k
    * (url, output, weight) for a prefix fragment, ranked by (weight desc,
    * url asc) with weight = how many inputs contain the fragment's gram.
    * Documents re-written by upsert resolve LATEST-wins WITHIN a shared
    * gram via the artifact's generation column; a gram only the OLD
    * edition contains (and tombstoned docs' grams) keeps serving the
    * superseded row until `Deletes.purge` consolidates the artifact to
    * live current generations — the same staleness window ES's completion
    * suggester has between a delete and a segment merge (DocSuggestSpec
    * pins both sides). The probe is a pushed-down gram scan; the top-k
    * cut runs distributed, so only k rows reach the driver. Memoized per
    * fragment like [[suggest]]. */
  def suggestDocs(fragment: String, k: Int): Array[(String, String, Int)] = {
    require(snap.docSuggestDirs != null && snap.docSuggestDirs.nonEmpty,
      "this snapshot has no doc-suggest artifact - build with " +
        "IndexConfig(docSuggestFields = ...)")
    val key = fragment.toLowerCase(java.util.Locale.ROOT)
    if (key.length < 4 || key.length > 10) return Array.empty
    suggestDocsMemo(key, k)
  }

  /** Per-fragment suggest memo (both autocomplete surfaces): caches the
    * top-`fetchN` rows per gram in an access-order LRU capped at `cap`
    * entries, so a long-lived serving handle holds O(cap x fetchN) rows,
    * never the artifact; oversize asks bypass the memo. One class for
    * both surfaces — the lazy-initialization-order trap the two
    * hand-rolled copies had (a strict val reading the cap as 0 during
    * construction) cannot recur. */
  private final class SuggestMemo[V](cap: Int, fetchN: Int,
      fetch: (String, Int) => Array[V]) {
    private val cache =
      new java.util.LinkedHashMap[String, Array[V]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[V]]): Boolean = size() > cap
      }
    def apply(key: String, k: Int): Array[V] = {
      if (k > fetchN) return fetch(key, k) // oversize asks bypass the memo
      val cached = cache.synchronized(Option(cache.get(key)))
      val all = cached.getOrElse {
        val rows = fetch(key, fetchN)
        cache.synchronized(cache.put(key, rows))
        rows
      }
      all.take(k)
    }
  }

  private val suggestFetch = 100
  private val suggestCacheCap = 10000
  private val suggestMemo =
    new SuggestMemo[(String, Long)](suggestCacheCap, suggestFetch, (key, n) =>
      spark.read.parquet(s"$indexDir/${snap.suggestDir.get}")
        .filter(col("gram") === key)
        .orderBy(col("cf").desc, col("term").asc)
        .limit(n)
        .select("term", "cf").collect()
        .map(r => (r.getString(0), r.getLong(1))))
  private val suggestDocsMemo =
    new SuggestMemo[(String, String, Int)](suggestCacheCap, suggestFetch,
      (key, n) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("url")).orderBy(col("gen").desc)
        spark.read
          .parquet(snap.docSuggestDirs.map(d => s"$indexDir/$d"): _*)
          .filter(col("gram") === key)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1) // upserted docs: newest generation wins
          .orderBy(col("weight").desc, col("url").asc)
          .limit(n)
          .select("url", "output", "weight").collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      })

  def close(): Unit = if (warm) postings.unpersist()
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

  /** docIds exactly as the builder assigns them. */
  private def assignIds(docs: Seq[(String, String)], numSegments: Int)
      : Seq[(Long, String, String)] = docs
    .map { case (url, text) =>
      (Hashing.segmentOf(url, numSegments), url, text)
    }
    .groupBy(_._1).toSeq
    .flatMap { case (seg, rows) =>
      rows.sortBy(_._2)(utf8Ordering).zipWithIndex.map { case ((_, url, text), i) =>
        (IndexBuilder.segBase(seg) + i + 1, url, text)
      }
    }

  def topK(
      docs: Seq[(String, String)], // (url, text)
      query: String,
      k: Int,
      numSegments: Int,
      deletedUrls: Set[String] = Set.empty): Array[Hit] =
    boolTopK(docs, BoolQuery.text(query), k, numSegments, deletedUrls)

  /** Exhaustive bool-query evaluation with the pinned BoolQuery semantics —
    * the differential-fuzz oracle for must/filter/ids/mustNot. */
  def boolTopK(
      docs: Seq[(String, String)],
      q0: BoolQuery,
      k: Int,
      numSegments: Int,
      deletedUrls: Set[String] = Set.empty): Array[Hit] = {
    val q = q0.normalized
    if (q.contradictory) return Array.empty

    val withIds = assignIds(docs, numSegments)
    val tfs = withIds.map { case (id, url, text) => (id, url, Analyzer.termFreqs(text)) }
    val n = tfs.size.toLong
    if (n == 0) return Array.empty
    val sumdl = tfs.iterator.map(_._3.valuesIterator.sum.toLong).sum
    val avgdl = Bm25.avgdl(n, sumdl)
    val scoringAll = (q.must ++ q.should).distinct.sorted
    val dfByTerm = scoringAll.map { t => t -> tfs.count(_._3.contains(t)).toLong }.toMap
    val idsSet = q.ids.map(_.toSet)

    // tombstoned docs are excluded from results but — exactly like
    // Lucene between a delete and a merge — still count in N/avgdl/df
    // (computed above over ALL docs)
    val scored = tfs.flatMap { case (id, url, tf) =>
      val pass = !deletedUrls.contains(url) &&
        idsSet.forall(_.contains(url)) &&
        q.must.forall(t => tf.getOrElse(t, 0) > 0) &&
        q.filter.forall(t => tf.getOrElse(t, 0) > 0) &&
        !q.mustNot.exists(t => tf.getOrElse(t, 0) > 0)
      if (!pass) None
      else {
        val doclen = tf.valuesIterator.sum
        var s = 0.0
        var any = false
        scoringAll.foreach { t => // ascending term order — float parity
          val f = tf.getOrElse(t, 0)
          if (f > 0 && dfByTerm(t) > 0) {
            any = true
            s += Bm25.idf(n, dfByTerm(t)) * Bm25.tfNorm(f, doclen, avgdl)
          }
        }
        if (q.hasRequired || any) Some((id, url, s)) else None
      }
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, url, s), i) => Hit(i + 1, id, url, s) }
      .toArray
  }

  /** Exhaustive MULTI-FIELD evaluation with the pinned field-scoped
    * semantics (the rank-identity oracle for IndexConfig.fields indexes):
    * df per tagged (field, token) term, idf over the TOTAL doc count
    * (pinned choice — ES uses the per-field docCount; one N keeps idf
    * comparable across a bool query's fields), tf counted within its
    * field, and PER-FIELD norms exactly like ES 7.4's per-field
    * similarity: each analyzed field scores with its own doc length and
    * avgdl (sum field length / docs containing the field); keyword fields
    * score norms-disabled (dl/avgdl pinned to 1 — with tf = 1 the
    * contribution is exactly idf), null values not indexed. Scoring
    * accumulates over the tagged must∪should terms in ascending term
    * order — float-order pinned exactly like the engine. */
  def fieldTopK(
      docs: Seq[(String, Map[String, String])], // url -> field values
      fields: Seq[graft.index.FieldDef],
      q0: BoolQuery,
      k: Int,
      numSegments: Int): Array[Hit] = {
    val q = q0.normalized
    if (q.contradictory) return Array.empty
    val sep = IndexBuilder.FieldSep
    val keywordFields = fields.filter(_.keyword).map(_.name).toSet
    // tagged tf map + per-field analyzed doc lengths
    def tfMapOf(vals: Map[String, String]): (Map[String, Int], Map[String, Int]) = {
      val m = scala.collection.mutable.HashMap.empty[String, Int]
      val dl = scala.collection.mutable.HashMap.empty[String, Int]
      fields.foreach { f =>
        val v = vals.getOrElse(f.name, null)
        if (f.keyword) { if (v != null) m.update(f.name + sep + v, 1) }
        else {
          var n = 0
          Analyzer.termFreqs(if (v == null) "" else v).foreach {
            case (t, c) => m.update(f.name + sep + t, c); n += c
          }
          dl.update(f.name, n)
        }
      }
      (m.toMap, dl.toMap)
    }
    val withIds = docs
      .map { case (url, vals) => (Hashing.segmentOf(url, numSegments), url, vals) }
      .groupBy(_._1).toSeq
      .flatMap { case (seg, rows) =>
        rows.sortBy(_._2)(utf8Ordering).zipWithIndex.map {
          case ((_, url, vals), i) =>
            (IndexBuilder.segBase(seg) + i + 1, url, vals)
        }
      }
    val tfs = withIds.map { case (id, url, vals) =>
      val (m, dl) = tfMapOf(vals); (id, url, m, dl)
    }
    val n = tfs.size.toLong
    if (n == 0) return Array.empty
    // per-field avgdl = sum field length / docs where the field produced
    // >= 1 token (ES avgFieldLength = sumTotalTermFreq / docCount)
    val fieldAvgdl: Map[String, Double] = fields.filterNot(_.keyword).map { f =>
      val present = tfs.count(_._4.getOrElse(f.name, 0) > 0).toLong
      val sumDl = tfs.iterator.map(_._4.getOrElse(f.name, 0).toLong).sum
      f.name -> Bm25.avgdl(present, sumDl)
    }.toMap
    val scoringAll = (q.must ++ q.should).distinct.sorted
    val dfByTerm = scoringAll.map(t => t -> tfs.count(_._3.contains(t)).toLong).toMap
    val idsSet = q.ids.map(_.toSet)
    val scored = tfs.flatMap { case (id, url, tf, dlByField) =>
      val pass = idsSet.forall(_.contains(url)) &&
        q.must.forall(t => tf.getOrElse(t, 0) > 0) &&
        q.filter.forall(t => tf.getOrElse(t, 0) > 0) &&
        !q.mustNot.exists(t => tf.getOrElse(t, 0) > 0)
      if (!pass) None
      else {
        var s = 0.0
        var any = false
        scoringAll.foreach { t => // ascending term order — float parity
          val f = tf.getOrElse(t, 0)
          if (f > 0 && dfByTerm(t) > 0) {
            any = true
            val fld = t.substring(0, t.indexOf(sep))
            val norm =
              if (keywordFields.contains(fld)) Bm25.tfNorm(f, 1, 1.0)
              else Bm25.tfNorm(f, dlByField(fld), fieldAvgdl(fld))
            s += Bm25.idf(n, dfByTerm(t)) * norm
          }
        }
        if (q.hasRequired || any) Some((id, url, s)) else None
      }
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, url, s), i) => Hit(i + 1, id, url, s) }
      .toArray
  }
}
