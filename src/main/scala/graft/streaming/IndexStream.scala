package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.{Hashing, IndexBuilder, IndexConfig, Snapshot, SnapshotMeta, Varint}

/** Incremental index maintenance from a page stream — the streaming
  * counterpart of the engine's own batch build (SURVEY §2.10 applied to
  * §2.8): each non-empty micro-batch appends ONE generation via
  * `IndexBuilder.append` (Iceberg-append semantics: committed segments,
  * docIds and posting bytes are immutable; global stats and the term
  * dictionary re-derive at commit), so queries see every streamed document
  * as soon as its generation commits.
  *
  * Exactly-once across restarts WITHOUT a side ledger: Structured Streaming
  * replays at most the last unacknowledged micro-batch, and whether that
  * batch's generation already committed is decided from the index itself —
  * the batch's first url either resolves in the TOP generation (fully
  * applied → skip), or the top generation is incomplete (crash mid-append →
  * resume completes it deterministically from the same batch), or is absent
  * (apply). The snapshot log doubles as the idempotence ledger. Input
  * contract (BASELINE.json input_hint): url is the primary key — a url must
  * appear in at most one micro-batch. */
object IndexStream {

  def readPages(spark: SparkSession, srcDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      schema: String = "url STRING, text STRING"): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(srcDir)
  }

  /** Shared None/incomplete-snapshot dispatch: fresh build, deterministic
    * resume of a crashed generation, or the stream-specific complete-index
    * action. Both streams' crash behavior lives here, once. */
  private def buildOrResume(spark: SparkSession, indexDir: String,
      cfg: IndexConfig, pages: DataFrame)(
      whenComplete: SnapshotMeta => Unit): Unit =
    Snapshot.latest(indexDir) match {
      case None =>
        IndexBuilder.build(spark, pages, indexDir, cfg)
      case Some(p) if !p.isComplete =>
        // crash mid-commit: finish the SAME batch's generation — the build
        // is deterministic, so resume produces the bytes the first attempt
        // would have (gen 0 resumes via build, later gens via append)
        if (p.generations == 1)
          IndexBuilder.build(spark, pages, indexDir, cfg, resume = true)
        else IndexBuilder.append(spark, pages, indexDir, resume = true)
      case Some(p) => whenComplete(p)
    }

  /** True iff `url` is already a document of the latest snapshot's TOP
    * generation — one pushed-down parquet read of that generation's url
    * table for the url's segment; no IndexHandle, no posting bytes. The
    * membership test runs executor-side (only a boolean crosses to the
    * driver), so driver memory stays independent of docs/segment. */
  private[graft] def inTopGeneration(
      spark: SparkSession, indexDir: String, url: String): Boolean =
    Snapshot.latest(indexDir) match {
      case None => false
      case Some(snap) =>
        import spark.implicits._
        val seg = (snap.generations - 1) * snap.numSegments +
          Hashing.segmentOf(url, snap.numSegments)
        snap.completedSegIds.contains(seg) && {
          spark.read
            .parquet(snap.dataDirs.map(d => s"$indexDir/$d"): _*)
            .filter(col("segId") === seg &&
              col("term") === IndexBuilder.TermUrls)
            .as[graft.index.PostingRow]
            .map(r => Varint.decodeStrings(r.tfBytes).contains(url))
            .filter(identity[Boolean] _)
            .head(1).nonEmpty
        }
    }

  /** foreachBatch body; public so tests can drive replay scenarios. */
  def applyBatch(spark: SparkSession, indexDir: String, cfg: IndexConfig)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    buildOrResume(spark, indexDir, cfg, batch) { _ =>
      val firstUrl = batch.select("url").head().getString(0)
      if (!inTopGeneration(spark, indexDir, firstUrl))
        IndexBuilder.append(spark, batch, indexDir)
      // else: replayed, already-committed batch → no-op
    }
  }

  /** Start the streaming append: one generation per non-empty micro-batch.
    * Drive with processAllAvailable() for bounded inputs. */
  def appendStream(spark: SparkSession, srcDir: String, indexDir: String,
      cfg: IndexConfig, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readPages(spark, srcDir, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        applyBatch(spark, indexDir, cfg)(b, id))
      .start()

  // ---- streaming RECRAWL ingestion: micro-batches may re-capture urls ----

  /** appendStream's replay detection (is the batch's first url in the top
    * generation?) breaks down when batches legitimately recapture urls, so
    * the recrawl stream keeps an explicit ledger next to the snapshot log,
    * written atomically AFTER the batch's commits. The ledger records
    * (lineage, batchId): batch ids only mean anything within ONE
    * Structured-Streaming checkpoint lineage — a restart with a fresh or
    * cleared checkpointDir renumbers batches from 0, and skipping those
    * against an old lineage's ids would silently drop fresh data. A
    * lineage change resets the ledger; the new lineage then re-processes
    * the source, and re-upserting already-indexed content is safe (below).
    *
    * Crash windows (at-least-once application, exactly-once ids/search
    * MEMBERSHIP): a crash between the upsert's commits and the ledger
    * write re-applies the batch — the re-upsert tombstones the generation
    * it just wrote and appends an identical one. Search results keep
    * serving exactly the latest edition of every url; like every
    * tombstone-not-purged state, N/avgdl/df count the dead duplicate until
    * `Deletes.purge`, so absolute BM25 scores in that window differ from a
    * never-crashed run's (ES between a delete and a merge behaves the same
    * way). Run purge on any schedule to converge stats. */
  private def ledgerPath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, "snapshots", "STREAM_LEDGER")

  private[graft] def lastBatchId(indexDir: String, lineage: String): Long = {
    val p = ledgerPath(indexDir)
    if (!java.nio.file.Files.exists(p)) -1L
    else java.nio.file.Files.readString(p).trim.split('\n') match {
      case Array(lin, id) if lin == lineage => id.toLong
      case _ => -1L // different (or pre-lineage) checkpoint lineage
    }
  }

  private def writeLedger(indexDir: String, lineage: String, batchId: Long): Unit = {
    val p = ledgerPath(indexDir)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(".STREAM_LEDGER.tmp")
    java.nio.file.Files.writeString(tmp, s"$lineage\n$batchId")
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** foreachBatch body for the recrawl stream: lang-scope, enforce the
    * extraction invariant, latest-edition-per-url within the batch, then
    * upsert (recaptured urls tombstone their old version, fresh urls
    * append). `lineage` identifies the checkpoint lineage the batch ids
    * belong to (refreshStream passes the checkpoint dir). Public so tests
    * can drive crash/replay scenarios. */
  def refreshBatch(spark: SparkSession, indexDir: String, cfg: IndexConfig,
      langs: Set[String] = Set.empty, lineage: String = "manual")(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    if (batchId <= lastBatchId(indexDir, lineage)) return // acknowledged replay
    val scoped =
      if (langs.isEmpty) batch
      else batch.filter(col("lang").isin(langs.toSeq: _*))
    val processed = graft.corpus.Ingest
      .latestPerUrl(graft.corpus.Ingest.extractValidate(scoped)._1)
      .select("url", "text")
    // a batch emptied by lang scoping / validation must not commit a
    // generation of empty segments (plus a full termdict rebuild) — but it
    // IS acknowledged, so replays skip it
    if (processed.isEmpty) { writeLedger(indexDir, lineage, batchId); return }
    buildOrResume(spark, indexDir, cfg, processed) { _ =>
      IndexBuilder.upsert(spark, processed, indexDir)
    }
    writeLedger(indexDir, lineage, batchId)
  }

  /** Start the streaming recrawl ingestion over a raw crawl directory
    * (url, warc_ts, html, text, lang rows). */
  def refreshStream(spark: SparkSession, srcDir: String, indexDir: String,
      cfg: IndexConfig, checkpointDir: String,
      langs: Set[String] = Set.empty,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readPages(spark, srcDir, maxFilesPerTrigger,
      schema = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        refreshBatch(spark, indexDir, cfg, langs, lineage = checkpointDir)(b, id))
      .start()
}
