package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus

/** Shared plumbing for the benchmark/probe mains (Bench, ScalingProbe,
  * BuildBench, LatencyProbe, BigSmoke, ServeBench). Each of these tools
  * independently re-derived the same three traps — the /dev/shm fallback,
  * the _SUCCESS-guarded one-time corpus staging, and the
  * clear-then-rebuild session restart — and at least one had already
  * drifted. One home ends that. */
object BenchHarness {

  /** RAM-backed work root (stand-in for a cluster node's local NVMe);
    * not every host mounts /dev/shm. */
  def tmpfsRoot: String =
    if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm" else "/tmp"

  /** Fresh local[cpus] session replacing any active one; shuffle
    * partitions pinned to the thread count. */
  def session(appName: String, cpus: Int, localDir: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Stage the seeded corpus to parquet ONCE (_SUCCESS-guarded): build
    * benchmarks measure docs/sec indexed from a stored table — corpus
    * generation must never contaminate the timing. */
  def stageCorpus(spark: SparkSession, base: String, docs: Long): String = {
    val corpusDir = s"$base/corpus-$docs"
    if (!Files.exists(Paths.get(corpusDir, "_SUCCESS")))
      Corpus.pages(spark, docs, seed = 42, numPartitions = 32)
        .select("url", "text").write.mode("overwrite").parquet(corpusDir)
    corpusDir
  }

  def deleteDir(dir: String): Unit =
    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()

  /** Median IS pctl(·, 50) — the nearest-rank LOWER median for even n.
    * Defining it independently (index n/2 = the upper median) made the
    * reported "p50" and "median" different order statistics on the same
    * 20-sample latency sets despite the ONE-definition goal. */
  def median(xs: Seq[Double]): Double = pctl(xs.sorted, 50)

  /** Nearest-rank percentile over a SORTED sample: the p-th percentile is
    * the ceil(p/100*n)-th order statistic — index ceil(...)−1. The naive
    * (n*p)/100 index reads the MAXIMUM as "p95" at n=20, which on a noisy
    * shared host reports exactly the outlier a percentile exists to
    * exclude. ONE definition for every benchmark (Bench, ServeBench,
    * LatencyProbe) so cross-tool p50/p95 comparisons compare the same
    * order statistic. Empty samples are a caller bug — fail loudly, not
    * with an opaque IndexOutOfBounds. */
  def pctl(sorted: Seq[Double], p: Int): Double = {
    require(sorted.nonEmpty, s"pctl(p=$p) over an empty sample")
    sorted(math.ceil(p / 100.0 * sorted.length).toInt - 1)
  }
}
