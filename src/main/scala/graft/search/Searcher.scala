package graft.search

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, PostingRow, Snapshot, Varint}

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

  def topK(spark: SparkSession, indexDir: String, query: String, k: Int): Array[Hit] = {
    import spark.implicits._
    val snap = Snapshot.latest(indexDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot under $indexDir"))
    require(snap.isComplete, s"index incomplete: ${snap.segments.size}/${snap.numSegments}")

    val qTerms = Analyzer.tokenize(query).distinct.sorted
    if (qTerms.isEmpty) return Array.empty
    val dictDir = s"$indexDir/${snap.termdictDir.get}"
    val dfByTerm = spark.read.parquet(dictDir)
      .filter(col("term").isin(qTerms: _*))
      .select("term", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val terms = qTerms.filter(dfByTerm.contains)
    if (terms.isEmpty) return Array.empty

    val idfMap = terms.map(t => t -> Bm25.idf(snap.numDocs, dfByTerm(t))).toMap
    val dataPaths = snap.dataDirs.map(d => s"$indexDir/$d")
    val avgdl = snap.avgdl
    val blockSize = snap.blockSize
    val kk = k
    val idfB = spark.sparkContext.broadcast(idfMap)

    val wanted: Seq[String] = IndexBuilder.TermLens +: terms
    val hits = spark.read.parquet(dataPaths: _*)
      .filter(col("term").isin(wanted: _*))
      .as[PostingRow]
      .groupByKey(_.segId)
      .flatMapGroups { (segId: Int, rowsIt: Iterator[PostingRow]) =>
        var lens: Array[Int] = null
        val posting = ArrayBuffer.empty[PostingRow]
        rowsIt.foreach { r =>
          if (r.term == IndexBuilder.TermLens) lens = Varint.decodeInts(r.docBytes)
          else posting += r
        }
        if (lens == null || posting.isEmpty) Iterator.empty
        else {
          val iters = posting.sortBy(_.term)
            .map(r => new PostingIterator(r, idfB.value(r.term), blockSize))
            .toArray
          iters.foreach(_.start())
          Wand.topK(iters, lens, IndexBuilder.segBase(segId), avgdl, kk)
            .iterator.map(h => (h.docId, h.score, segId))
        }
      }
      .toDF("docId", "score", "segId")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()

    if (hits.isEmpty) return Array.empty
    val winnerSegs = hits.map(_.getInt(2)).distinct.toSeq
    val urlByDoc = spark.read.parquet(dataPaths: _*)
      .filter(col("term") === IndexBuilder.TermUrls && col("segId").isin(winnerSegs: _*))
      .as[PostingRow]
      .flatMap { r =>
        Varint.decodeStrings(r.tfBytes).iterator.zipWithIndex.map {
          case (u, i) => (IndexBuilder.segBase(r.segId) + i + 1, u)
        }
      }
      .toDF("docId", "url")
      .filter(col("docId").isin(hits.map(_.getLong(0)).toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    hits.zipWithIndex.map { case (r, i) =>
      Hit(i + 1, r.getLong(0), urlByDoc(r.getLong(0)), r.getDouble(1))
    }
  }

  /** DataFrame form for SparkEntry / driver smoke checks. */
  def topKDF(spark: SparkSession, indexDir: String, query: String, k: Int): DataFrame = {
    import spark.implicits._
    topK(spark, indexDir, query, k).toSeq
      .toDF("rank", "docId", "url", "score")
  }
}

/** Deliberately naive exhaustive scorer — the in-repo "reference
  * implementation" the rank-identical acceptance tests compare against
  * (SURVEY.md §5 item 2). Pure driver-side Scala over raw (url, text) rows:
  * no index, no pruning; shares only Analyzer/Bm25/Hashing so that token
  * streams, docIds and float orders are pinned identically by construction. */
object OracleSearch {

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
        rows.sortBy(_._2).zipWithIndex.map { case ((_, url, text), i) =>
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
