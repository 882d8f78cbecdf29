package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.IndexHandle

/** Round benchmark. Emits ONE JSON line:
  *  - per-query wall seconds for every SparkEntry query at SPARK_GRAFT_SF_DIR
  *  - index-build throughput (docs/sec) over an identical stored corpus at
  *    local[4] / local[16] / local[32], with scaling efficiency
  *    (tp_4N / tp_N) / 4 for the 4->16 pair — the sandbox evidence for the
  *    north rule's N->4N >= 0.8 criterion (the 4->32 comparison at ideal
  *    8x is also reported as scaling_4_to_32; at 32 threads this VM
  *    saturates memory bandwidth, see BASELINE.md)
  *  - warm p50/p95 BM25 top-10 latency over the fixed 20-query set
  *
  * Methodology: corpus staged to parquet once (generation excluded — the
  * metric is docs/sec indexed from a stored table); one small warmup build
  * per level (JIT); best of `GRAFT_BENCH_REPS` timed builds per level;
  * shuffle + index dirs on a RAM-backed tmpfs standing in for the
  * node-local NVMe of a real cluster.
  */
object Bench {

  private def session(cpus: Int, localDir: String): SparkSession =
    graft.tools.BenchHarness.session(s"graft-bench-$cpus", cpus, localDir)

  /** The fixed 20-query latency set — ONE home, shared with ServeBench so
    * the two benchmarks' p50/p95/QPS numbers stay comparable. */
  private[graft] val benchQueries = Seq(
    "the data", "spark fast", "merge sort join", "crawl web page index",
    "block max cache disk", "value order group window", "wi-fi", "the",
    "posting shard segment score rank", "w100x w200x", "w999x", "data",
    "hash part line agg", "customer small big", "stream batch", "dup",
    "vector join", "term posting", "score rank", "index segment")

  def main(args: Array[String]): Unit = {
    // JSON output must parse anywhere: f"%.3f" uses the default locale,
    // and a comma-decimal locale would emit malformed JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "2000000").toLong
    // 7 interleaved pairs by default: two same-code runs an hour apart
    // measured efficiency 0.69 vs 0.76 and p50 140 vs 170 ms on this
    // shared VM — the median over more pairs tightens against that steal
    // noise at ~3 min extra wall
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "7").toInt
    // always work (and later delete) a dedicated subdirectory, never the
    // user-supplied path itself — GRAFT_BENCH_TMP=/tmp must not wipe /tmp
    val baseRoot = sys.env.getOrElse("GRAFT_BENCH_TMP",
      graft.tools.BenchHarness.tmpfsRoot)
    val base = s"$baseRoot/graft-bench"
    Files.createDirectories(Paths.get(base))
    val localDir = s"$base/spark-local"
    val cfg = IndexConfig(numSegments = 256, blockSize = 128)

    // machine-speed canary at the START too: a contention window can
    // cover part of the run and end before the end-of-run sample (one
    // observed run had every mid-run metric ~2x depressed while the
    // final canary read the fastest of the round). The pre/post pair
    // brackets the run; a large gap between them flags "host speed
    // changed mid-run — treat this line as an outlier".
    val (canPreCpu, canPreMem) = graft.tools.BenchHarness.canary()

    // ---- stage the corpus once (not timed)
    var spark = session(cpus, localDir)
    spark.sparkContext.setLogLevel("WARN")
    // a failed run must still stop Spark and free the RAM-backed staging
    // (GBs on /dev/shm) — every other bench tool wraps the same lifecycle
    try {
    val corpusDir = graft.tools.BenchHarness.stageCorpus(spark, base, benchDocs)

    // ---- build throughput: the N->4N efficiency is a RATIO, and the
    // dominant error source on this shared-host VM is machine-speed DRIFT
    // between the two levels' measurement windows. So the levels are
    // measured as INTERLEAVED PAIRS — (4,16),(4,16),... — and the
    // efficiency is the median of per-pair ratios: drift hits both sides
    // of each pair equally and cancels; a median absorbs one bad pair.
    // Throughput runs come FIRST (before the query sweep) so builds see a
    // young heap; sessions restart and the heap GCs between levels.
    var lastIndexDir: String = null
    var repIdx = 0
    def buildOnce(n: Int): Double = {
      spark.stop()
      System.gc()
      spark = session(n, localDir)
      spark.sparkContext.setLogLevel("WARN")
      val input = spark.read.parquet(corpusDir)
      repIdx += 1
      // keep at most ONE finished index on tmpfs: 17 reps x GBs would
      // exhaust /dev/shm on smaller hosts before the final cleanup
      if (lastIndexDir != null)
        graft.tools.BenchHarness.deleteDir(lastIndexDir)
      val dir = Files.createTempDirectory(Paths.get(base), s"idx-$n-$repIdx").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, dir, cfg)
      lastIndexDir = dir
      (System.nanoTime() - t0) / 1e9
    }
    def warmLevel(n: Int): Unit = { // JIT + shuffle-path warmup per level
      spark.stop()
      spark = session(n, localDir)
      spark.sparkContext.setLogLevel("WARN")
      val warm = Files.createTempDirectory(Paths.get(base), s"warm-$n").toString
      IndexBuilder.build(spark, spark.read.parquet(corpusDir).limit(20000), warm, cfg)
    }
    warmLevel(4)
    warmLevel(16)
    // alternate the within-pair order so monotone host-speed drift during a
    // pair biases alternate pairs in opposite directions and cancels in the
    // median (the host is a shared VM; CPU steal is the dominant noise)
    val pairs = (1 to reps).map { i =>
      if (i % 2 == 1) (buildOnce(4), buildOnce(16))
      else { val t16 = buildOnce(16); (buildOnce(4), t16) }
    }
    import graft.tools.BenchHarness.median
    val tp4 = benchDocs / median(pairs.map(_._1))
    val tp16 = benchDocs / median(pairs.map(_._2))
    // efficiency from paired ratios (drift-cancelling), not from the two
    // medians — report the band across pairs alongside the point estimate
    val effPairs = pairs.map { case (t4, t16) => t4 / (4.0 * t16) }.sorted
    val eff416 = median(effPairs)
    // band hygiene: one host-steal pair can make the raw min/max band
    // unreadable (r3 saw a 0.099 pair against a 0.83 median). Report a
    // TRIMMED band (drop the extreme pair at each end) alongside the raw
    // one, plus the count of outlier pairs — pairs whose ratio sits >3x
    // from the median in either direction, i.e. whose two sides ran ~3x
    // apart relative to the others.
    val effTrimmed =
      if (effPairs.length >= 3) effPairs.slice(1, effPairs.length - 1)
      else effPairs
    val outlierPairs =
      effPairs.count(e => e < eff416 / 3.0 || e > eff416 * 3.0)
    val tp32 = {
      warmLevel(32)
      val times = (1 to math.max(1, reps - 1)).map(_ => buildOnce(32))
      benchDocs / median(times)
    }
    val eff432 = (tp32 / tp4) / 8.0 // informational: 4->32 at ideal 8x

    // ---- operator queries at the requested parallelism (after the
    // throughput phase; first query still warms up on a fresh session)
    spark.stop()
    spark = session(cpus, localDir)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () })
    // the index-backed queries build (and memoize) a real index on first
    // call — q39-41 even run a delete/purge/upsert lifecycle first. That
    // one-off build cost is reported SEPARATELY (index_prewarm) so the
    // sweep's per-query numbers read as query latency, not build+query.
    val indexBacked = Seq("q21_bm25_topk", "q31_suggest", "q32_bool_query",
      "q33_ids_filter", "q39_delete_search", "q40_purge_search",
      "q41_upsert_search", "q49_fetch_source", "q51_field_search",
      "q57_scan_midsize") // q55/q56 share q51's multifield index
    val prewarm = indexBacked.flatMap(name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // ---- warm query latency on the last (local[32]) index
    val handle = new IndexHandle(spark, lastIndexDir)
    // warm EVERY query once: the first run of a query pays a one-time
    // driver url-resolution job for its winning segments — warming only a
    // few would leave 16/20 measured samples carrying that cold cost
    benchQueries.foreach(q => handle.topK(q, 10))
    val lat = benchQueries.map { q =>
      val t0 = System.nanoTime()
      handle.topK(q, 10)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val p50 = graft.tools.BenchHarness.pctl(lat, 50)
    val p95 = graft.tools.BenchHarness.pctl(lat, 95)
    // hot-serving path (driver-memoized postings, rank-identical)
    benchQueries.foreach(q => handle.servedTopK(q, 10)) // populate caches
    val slat = benchQueries.map { q =>
      val t0 = System.nanoTime()
      handle.servedTopK(q, 10)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val sp50 = graft.tools.BenchHarness.pctl(slat, 50)
    val sp95 = graft.tools.BenchHarness.pctl(slat, 95)
    // hot-serving throughput under concurrency: 8 client threads hammer the
    // shared handle (thread safety spec'd in IndexSearchSpec) — the metric a
    // query-serving tier actually provisions against
    val qpsThreads = 8
    val perThread = 250
    val pool = java.util.concurrent.Executors.newFixedThreadPool(qpsThreads)
    val tq0 = System.nanoTime()
    val futs = (0 until qpsThreads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = 0
          while (i < perThread) {
            handle.servedTopK(benchQueries((t + i) % benchQueries.length), 10)
            i += 1
          }
        }
      })
    }
    // shutdown in finally: a worker exception rethrown from get() would
    // otherwise leave 8 non-daemon threads alive and hang the JVM forever
    try futs.foreach(_.get()) finally pool.shutdown()
    val servedQps = qpsThreads * perThread / ((System.nanoTime() - tq0) / 1e9)

    // machine-speed canary, measured at the END of the run (the steady
    // state the latency numbers above were taken in)
    val (canCpu, canMem) = graft.tools.BenchHarness.canary()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val pw = prewarm.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val prewarmTotal = prewarm.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"index_prewarm":$pw,"index_prewarm_total":$prewarmTotal%.3f,"sf":"$sfDir","index_docs_per_sec_4":$tp4%.1f,"index_docs_per_sec_16":$tp16%.1f,"index_docs_per_sec_32":$tp32%.1f,"scaling_efficiency":$eff416%.3f,"scaling_efficiency_pairs_min":${effPairs.head}%.3f,"scaling_efficiency_pairs_max":${effPairs.last}%.3f,"scaling_efficiency_trimmed_min":${effTrimmed.head}%.3f,"scaling_efficiency_trimmed_max":${effTrimmed.last}%.3f,"scaling_outlier_pairs":$outlierPairs,"scaling_4_to_32":$eff432%.3f,"bench_docs":$benchDocs,"bm25_p50_ms":$p50%.1f,"bm25_p95_ms":$p95%.1f,"bm25_served_p50_ms":$sp50%.2f,"bm25_served_p95_ms":$sp95%.2f,"bm25_served_qps_8thr":$servedQps%.0f,"canary_cpu_mops":$canCpu%.1f,"canary_membw_gbps":$canMem%.2f,"canary_pre_cpu_mops":$canPreCpu%.1f,"canary_pre_membw_gbps":$canPreMem%.2f}""")
    } finally {
      spark.stop()
      // free the tmpfs space
      graft.tools.BenchHarness.deleteDir(base)
    }
  }
}
