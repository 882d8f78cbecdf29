package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.IndexHandle

/** Focused hot-serving benchmark: build one index, then measure warm
  * servedTopK latency (p50/p95/p99) and concurrent throughput at several
  * client-thread counts. One JSON line on stdout.
  * Usage: runMain graft.tools.ServeBench [docs] [segments] */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val segments = args.lift(1).map(_.toInt).getOrElse(256)
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val base = sys.env.getOrElse("GRAFT_SMOKE_TMP", BenchHarness.tmpfsRoot) + "/graft-servebench"
    Files.createDirectories(Paths.get(base))
    val spark = Sessions.withMaster(SparkSession.builder(), "local[32]")
      .appName("graft-servebench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = graft.Bench.benchQueries // shared fixed 20-query set
    try {
      val idxDir = Files.createTempDirectory(Paths.get(base), "idx").toString
      IndexBuilder.build(spark,
        Corpus.pages(spark, docs, seed = 42, numPartitions = 32).toDF(),
        idxDir, IndexConfig(numSegments = segments, blockSize = 128))
      val h = new IndexHandle(spark, idxDir)
      (1 to 3).foreach(_ => queries.foreach(q => h.servedTopK(q, 10))) // warm
      val lat = (1 to 5).flatMap(_ => queries).map { q =>
        val t0 = System.nanoTime()
        h.servedTopK(q, 10)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      def pct(p: Int) = BenchHarness.pctl(lat, p) // nearest-rank
      val qps = Seq(1, 4, 8, 16).map { threads =>
        val perThread = 300
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val t0 = System.nanoTime()
        val futs = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = 0
              while (i < perThread) {
                h.servedTopK(queries((t + i) % queries.length), 10)
                i += 1
              }
            }
          })
        }
        try futs.foreach(_.get()) finally pool.shutdown()
        threads -> (threads * perThread / ((System.nanoTime() - t0) / 1e9))
      }
      h.close()
      val qpsJson = qps.map { case (t, v) => f""""qps_$t%d":$v%.0f""" }.mkString(",")
      println(f"""{"servebench_docs":$docs,"segments":$segments,"p50_ms":${pct(50)}%.2f,"p95_ms":${pct(95)}%.2f,"p99_ms":${pct(99)}%.2f,$qpsJson}""")
    } finally {
      spark.stop()
      BenchHarness.deleteDir(base)
    }
  }
}
