package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.search.{OracleSearch, Searcher}

/** Segment-count scale proof for the north rule's 10¹²-doc sizing.
  *
  * `numSegments` is pinned at build time; one segment = one task = one
  * sorted run. The sizing rule (documented in BASELINE.md): segments sized
  * for 10⁶-10⁸ docs each — 10¹² docs → O(10⁴-10⁵) segments — so the
  * machinery must hold at thousands of segments, not the 8-256 the specs
  * use. This drives a 4096-segment build (scaled-down docs/segment) and
  * checks: snapshot completeness (4096/4096 committed, including the
  * empty-segment path), the driver-computed murmur3 bijection (4096 keys,
  * segment s -> partition s exactly), the per-partition window sort, and
  * rank+score identity vs the exhaustive oracle.
  *
  * Usage: runMain graft.tools.SegScale [docs=200000]
  */
object SegScale {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val P = 4096
    val spark = Sessions.withMaster(SparkSession.builder(), "local[32]")
      .appName("graft-segscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = Corpus.pages(spark, nDocs, seed = 42, numPartitions = 32).toDF()
      .cache()
    pages.count()
    val dir = Files.createTempDirectory("graft-segscale").toString
    try {
    val t0 = System.nanoTime()
    val snap = IndexBuilder.build(spark, pages, dir,
      IndexConfig(numSegments = P, blockSize = 128))
    val secs = (System.nanoTime() - t0) / 1e9

    require(snap.isComplete, s"incomplete: ${snap.segments.size}/$P")
    require(snap.segments.size == P)
    require(snap.segments.map(_.docs).sum == nDocs)
    val emptySegs = snap.segments.count(_.docs == 0)
    val maxDocs = snap.segments.map(_.docs).max
    val minDocs = snap.segments.map(_.docs).min

    // rank+score identity at P=4096 on a doc sample is meaningless — use
    // the full corpus exactly like IndexSearchSpec does
    import spark.implicits._
    val docs = pages.select("url", "text").as[(String, String)].collect().toSeq
    val queries = Seq("the data", "merge sort join", "w100x w200x", "wi-fi")
    val identical = queries.forall { q =>
      val engine = Searcher.topK(spark, dir, q, 10)
      val oracle = OracleSearch.topK(docs, q, 10, P)
      engine.map(h => (h.docId, h.score)).toSeq ==
        oracle.map(h => (h.docId, h.score)).toSeq
    }
    require(identical, "rank/score drift at P=4096")

    println(f"""{"segscale_docs":$nDocs,"segments":$P,"build_sec":$secs%.1f,"docs_per_sec":${nDocs / secs}%.0f,"empty_segments":$emptySegs,"min_docs_per_seg":$minDocs,"max_docs_per_seg":$maxDocs,"rank_identity":$identical}""")
    Snapshot.latest(dir).foreach(s => require(s.termdictDir.nonEmpty))
    spark.stop()
    // a 4096-segment index tree left in /tmp per run fills the shared VM
    } finally BenchHarness.deleteDir(dir)
  }
}
