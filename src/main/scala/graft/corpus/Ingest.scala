package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, SnapshotMeta}

/** Crawl-ingestion front-end over the raw input table
  * (url, warc_ts, html, text, lang — BASELINE.json input_hint):
  *
  *  - [[latestPerUrl]]: a Common-Crawl dump carries multiple editions of a
  *    url across crawls; latest `warc_ts` wins (deterministic tie-break on
  *    the html bytes' md5 so replays cannot flap between equal-ts rows)
  *  - [[extractValidate]]: re-extract text from the html bytes and enforce
  *    the north rule's per-row invariant — extracted text byte-identical
  *    to the `text` column per url — routing violations (truncated/corrupt
  *    captures) to an invalid channel with an explanation, never into the
  *    index (same dual-route shape as ops.Routing / reference
  *    Evidences.py:290-308)
  *  - [[refreshIndex]]: fold a new crawl into an existing index —
  *    lang-filter, validate, latest-per-url, then `IndexBuilder.upsert`
  *    (recrawled urls tombstone their old version, new urls append)
  *
  * All stages are single-exchange column pipelines: the window in
  * latestPerUrl shuffles on url once; validation is a narrow map. */
object Ingest {

  private val extractUdf =
    udf((html: Array[Byte]) => if (html == null) "" else Html.extract(html))

  /** One row per url: max warc_ts, ties broken by the md5 of ALL payload
    * columns so the winner is a pure function of the row set — two rows
    * equal on (warc_ts, html) but differing in text/lang (a capture that
    * lost a column) must not flap with partition order across replays.
    * Each column is presence-tagged before concatenation: concat_ws SKIPS
    * null arguments, so without the tag a row with (text=x, lang=null)
    * would hash identically to (text=null, lang=x) -- reintroducing the
    * partition-order flap for exactly the lost-column captures this
    * tie-break exists for. */
  def latestPerUrl(raw: DataFrame): DataFrame = {
    def tagged(c: Column): Column =
      when(c.isNull, lit("0")).otherwise(concat(lit("1"), c))
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc,
        md5(concat_ws("\u0000", tagged(md5(col("html"))),
          tagged(col("text")), tagged(col("lang")))).asc)
    raw.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Split into (valid, invalid): a row is valid iff `text` is non-empty
    * and byte-identical to `Html.extract(html)`. Invalid rows carry an
    * `explanation` column (first failing rule, via the shared
    * `ops.Routing.explain` cascade). Both halves are views over one
    * tagged plan — a caller consuming both (the dual-route shape) should
    * cache it or go through `Routing.routeValidInvalid`, which does. */
  def extractValidate(raw: DataFrame): (DataFrame, DataFrame) = {
    val tagged = graft.ops.Routing.explain(
      raw.withColumn("_extracted", extractUdf(col("html"))),
      Seq(
        "empty_text" -> (col("text").isNull || length(col("text")) === 0),
        "extract_mismatch" -> (col("_extracted") =!= col("text"))))
    (tagged.filter(col("explanation").isNull).drop("explanation", "_extracted"),
      tagged.filter(col("explanation").isNotNull).drop("_extracted"))
  }

  /** Ingest a crawl batch into `indexDir`: keep `langs` (empty set = all),
    * enforce the extraction invariant, latest-edition-per-url, then upsert.
    * Returns the committed snapshot. The caller routes `invalid` rows from
    * [[extractValidate]] separately if it needs the reject channel. */
  def refreshIndex(
      spark: SparkSession,
      rawCrawl: DataFrame,
      indexDir: String,
      langs: Set[String] = Set.empty): SnapshotMeta = {
    val scoped =
      if (langs.isEmpty) rawCrawl
      else rawCrawl.filter(col("lang").isin(langs.toSeq: _*))
    val (valid, _) = extractValidate(scoped)
    // persisted: the extract UDF + latest-per-url window otherwise
    // re-execute for the isEmpty probe, upsert's tombstone-match join and
    // the append scan — 3x the ingest cost per refresh
    val batch = latestPerUrl(valid).select("url", "text").persist()
    try {
      // a batch emptied by scoping/validation must not commit a generation
      // of empty segments plus a full termdict rebuild
      if (batch.isEmpty)
        graft.index.Snapshot.latest(indexDir).getOrElse(
          throw new IllegalStateException(s"no snapshot under $indexDir"))
      else IndexBuilder.upsert(spark, batch, indexDir)
    } finally batch.unpersist()
  }
}
