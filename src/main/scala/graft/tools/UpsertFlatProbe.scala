package graft.tools

import java.nio.file.{Files, Paths}

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.streaming.IndexStream

/** Streaming-upsert flatness evidence: the per-micro-batch cost of the
  * recrawl stream must be proportional to the BATCH, not to the
  * accumulated index (the candidate-segment prune reads O(batch ×
  * generations) segments, never the whole index). This probe builds
  * indexes of 1/2/4/8 generations at a fixed per-generation corpus, then
  * applies fixed-size recrawl batches through the real streaming body
  * (IndexStream.refreshBatch) and reports per-batch wall time per
  * generation count. Flat-with-±noise across 1..8 generations is the
  * claim; since the commit-time termdict went incremental
  * (IndexBuilder.writeTermdictDelta) the per-commit artifact cost is
  * O(vocab + batch metadata), no longer O(generations x vocab), so the
  * probe also reports the termdict plan taken on the last batch.
  * One JSON line.
  * Usage: runMain graft.tools.UpsertFlatProbe [docsPerGen] [batchDocs] */
object UpsertFlatProbe {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val docsPerGen = args.headOption.map(_.toLong).getOrElse(100000L)
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(3000)
    val base = s"${BenchHarness.tmpfsRoot}/graft-upsertflat"
    Files.createDirectories(Paths.get(base))
    val spark = BenchHarness.session("graft-upsertflat", 32, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    val cfg = IndexConfig(numSegments = 32, blockSize = 128)

    def timed(f: => Unit): Double = BenchHarness.timed(f)._2

    var ok = false
    try {
      val results = Seq(1, 2, 4, 8).map { gens =>
        val idxDir = Files.createTempDirectory(Paths.get(base), s"idx-g$gens").toString
        // g generations of url-disjoint corpora (startId ranges)
        (0 until gens).foreach { g =>
          val pages = Corpus.pages(spark, docsPerGen, seed = 42,
            numPartitions = 32, startId = g * docsPerGen)
            .select("url", "text").toDF()
          if (g == 0) IndexBuilder.build(spark, pages, idxDir, cfg)
          else IndexBuilder.append(spark, pages, idxDir)
        }
        // three fixed-size recrawl batches through the streaming body:
        // half recaptured gen-0 urls (tombstone + re-add), half new urls
        val times = (0 until 3).map { b =>
          val recapture = Corpus.pages(spark, batchDocs / 2, seed = 42,
            numPartitions = 8, startId = b.toLong * batchDocs)
          val fresh = Corpus.pages(spark, batchDocs - batchDocs / 2, seed = 42,
            numPartitions = 8,
            startId = 100L * docsPerGen + b.toLong * batchDocs)
          val batch = recapture.unionAll(fresh).toDF()
          timed(IndexStream.refreshBatch(spark, idxDir, cfg,
            lineage = s"probe-g$gens")(batch, b.toLong))
        }
        val snap = Snapshot.latest(idxDir).get
        (gens, times, snap.numDocs)
      }
      val cells = results.map { case (g, ts, docs) =>
        f""""g$g":{"docs":$docs,"batch_secs":[${ts.map(t => f"$t%.2f").mkString(",")}],"median_sec":${BenchHarness.median(ts)}%.2f}"""
      }
      println(s"""{"upsert_flatness":{"docs_per_gen":$docsPerGen,"batch_docs":$batchDocs,"termdict_plan":"${IndexBuilder.lastTermdictPlan}",${cells.mkString(",")}}}""")
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
