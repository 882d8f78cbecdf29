package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.IndexHandle

/** Distributed-path latency profiler: where do the milliseconds of a warm
  * `IndexHandle.topK` go — Spark job time (task scheduling + cached-batch
  * scan + scoring) vs driver-side overhead (compile, dict probe, url
  * resolution)? Sweeps the two warm-cache layout knobs that plausibly set
  * the floor: cached-partition count (task scheduling) and in-memory
  * columnar batch size (decode waste per touched batch: a 10k-row batch of
  * multi-KB posting blobs decompresses wholesale even when the query needs
  * three rows of it).
  *
  * Env: GRAFT_PROBE_DOCS (default 2000000), GRAFT_PROBE_CPUS (32).
  * Usage: runMain graft.tools.LatencyProbe */
object LatencyProbe {

  private final class JobClock extends SparkListener {
    val totalMs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(js: SparkListenerJobStart): Unit =
      starts.put(js.jobId, System.nanoTime())
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val t0 = starts.remove(je.jobId)
      if (t0 != 0L) { totalMs.addAndGet((System.nanoTime() - t0) / 1000000); jobs.incrementAndGet() }
    }
    def reset(): Unit = { totalMs.set(0); jobs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "2000000").toLong
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "32").toInt
    val baseRoot = BenchHarness.tmpfsRoot
    val base = s"$baseRoot/graft-probe"
    Files.createDirectories(Paths.get(base))
    val cfg = IndexConfig(numSegments = 256, blockSize = 128)

    // cache layout is owned by IndexHandle's explicit knobs; the session
    // restart per probe exists only to drop the previous probe's cache
    def session(): SparkSession =
      BenchHarness.session("graft-latency-probe", cpus, s"$base/spark-local")

    // stage corpus + index once, reused across probe runs
    var spark = session()
    spark.sparkContext.setLogLevel("WARN")
    val idxDir = s"$base/idx-$docs"
    if (!Files.exists(Paths.get(idxDir, "snapshots"))) {
      val corpusDir = BenchHarness.stageCorpus(spark, base, docs)
      IndexBuilder.build(spark, spark.read.parquet(corpusDir), idxDir, cfg)
    }

    val queries = graft.Bench.benchQueries

    def probe(tag: String, batchSize: Int, warmParts: Option[Int]): Unit = {
      spark.stop()
      spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val clock = new JobClock
      spark.sparkContext.addSparkListener(clock)
      // knobs passed EXPLICITLY (the handle owns the batch-size conf now,
      // so a session-level setting would silently not apply); the label
      // reports the partition count the handle ACTUALLY uses, so env
      // overrides of GRAFT_PROBE_CPUS can't make rows lie
      val parts = warmParts.getOrElse(
        math.max(1, math.min(cfg.numSegments, cpus / 2)))
      val label = s"$tag(batch=$batchSize,parts=$parts)"
      val handle = new IndexHandle(spark, idxDir, warm = true,
        warmPartitions = warmParts, cacheBatchSize = batchSize)
      queries.foreach(q => handle.topK(q, 10)) // warm JIT + url caches
      clock.reset()
      val lat = queries.map { q =>
        val t0 = System.nanoTime()
        handle.topK(q, 10)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val p50 = BenchHarness.pctl(lat, 50)
      val p95 = BenchHarness.pctl(lat, 95) // nearest-rank, not max
      val jobMs = clock.totalMs.get().toDouble / queries.length
      val njobs = clock.jobs.get().toDouble / queries.length
      println(f"[probe] $label%-28s p50=$p50%7.1f ms  p95=$p95%7.1f ms  " +
        f"avgJobMs=$jobMs%7.1f  jobs/query=$njobs%.1f")
      handle.close()
    }

    // first config repeated last: JVM-wide JIT warms across probes, so the
    // first row is systematically slow — compare the two copies to gauge
    // that bias before reading the middle rows
    probe("old-default", 10000, Some(cpus))
    probe("sweep", 1000, Some(cpus))
    probe("sweep", 100, Some(cpus))
    probe("sweep", 10000, Some(math.max(1, cpus / 4)))
    probe("sweep", 1000, Some(math.max(1, cpus / 4)))
    probe("new-default", 1000, None)
    probe("sweep", 100, Some(math.max(1, cpus / 2)))
    probe("old-default-repeat", 10000, Some(cpus))

    spark.stop()
    // free the RAM-backed staging (corpus + index, GBs of /dev/shm)
    BenchHarness.deleteDir(base)
  }
}
