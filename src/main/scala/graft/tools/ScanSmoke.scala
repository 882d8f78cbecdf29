package graft.tools

import java.nio.file.{Files, Paths}

import graft.tools.BenchHarness.timed
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{BoolQuery, Searcher}

/** Scale smoke for the enumeration surfaces (q53/q54): build an
  * N-doc index, then run `Searcher.count` (track_total_hits) and
  * `matchesDF` (scan-with-query) with a HEAD term matching a large
  * fraction of the corpus — the workload where a driver-side or
  * materializing implementation would fall over. The match set is only
  * counted/aggregated on the executors; nothing corpus-sized reaches the
  * driver. Prints one JSON line.
  * Usage: runMain graft.tools.ScanSmoke [docs] */
object ScanSmoke {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val docs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val base = s"${BenchHarness.tmpfsRoot}/graft-scansmoke"
    Files.createDirectories(Paths.get(base))
    val spark = BenchHarness.session("graft-scansmoke", 32, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpusDir = BenchHarness.stageCorpus(spark, base, docs)
      val idxDir = Files.createTempDirectory(Paths.get(base), "idx").toString
      IndexBuilder.build(spark, spark.read.parquet(corpusDir), idxDir,
        IndexConfig(numSegments = 256, blockSize = 128))

      // three workloads: "the" is the head term (df ~= 0.75N in the seeded
      // corpus) — the broad-match case; a negated-head query (cheap match
      // set, expensive exclusion cursor); and a genuine tail conjunction
      val broad = BoolQuery(filter = Seq("the"))
      val negHead = BoolQuery(must = Seq("data"), mustNot = Seq("the"))
      // w100x/w200x are the seeded corpus's synthetic TAIL tokens (the
      // bench query set uses them for the same purpose)
      val tailConj = BoolQuery(must = Seq("w100x", "w200x"))
      import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
      val (cBroad, tCount) = timed(Searcher.count(spark, idxDir, broad))
      // enumerate + aggregate executor-side: distinct segments touched and
      // total rows, without collecting the match set
      val (scanAgg, tScan) = timed {
        Searcher.matches(spark, idxDir, broad)
          .groupBy("segId").count()
          .agg(count(lit(1)), coalesce(sum("count"), lit(0L)))
          .collect()(0)
      }
      val segsTouched = scanAgg.getLong(0)
      val scanRows = scanAgg.getLong(1)
      val (cNeg, tNeg) = timed(Searcher.count(spark, idxDir, negHead))
      val (cTail, tTail) = timed(Searcher.count(spark, idxDir, tailConj))
      require(scanRows == cBroad,
        s"scan enumeration ($scanRows) != count ($cBroad)")
      println(f"""{"scansmoke_docs":$docs,"broad_matches":$cBroad,"count_sec":$tCount%.2f,"scan_sec":$tScan%.2f,"scan_segments":$segsTouched,"neg_head_matches":$cNeg,"neg_head_sec":$tNeg%.2f,"tail_conj_matches":$cTail,"tail_conj_sec":$tTail%.2f}""")
      // success cleanup only: a failed run (require above) leaves the
      // index behind for inspection, like Demo
      BenchHarness.deleteDir(base)
    } finally spark.stop()
  }
}
