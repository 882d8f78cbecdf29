package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}

/** Build-throughput scaling surface: docs/sec at several local[N] levels,
  * interleaved round-robin so shared-host speed drift hits every level
  * equally. Purpose: pick the (N, 4N) pair whose efficiency measurement is
  * least polluted by single-socket artifacts — on one VM all "executors"
  * share a memory bus, so levels near bandwidth saturation understate the
  * scaling a real multi-node cluster (per-node bus) would show.
  *
  * Env: GRAFT_SCALE_DOCS (default 1000000), GRAFT_SCALE_REPS (3),
  * GRAFT_SCALE_LEVELS (comma list, default "2,4,8,16,32").
  * Usage: runMain graft.tools.ScalingProbe */
object ScalingProbe {

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("GRAFT_SCALE_DOCS", "1000000").toLong
    val reps = sys.env.getOrElse("GRAFT_SCALE_REPS", "3").toInt
    val levels = sys.env.getOrElse("GRAFT_SCALE_LEVELS", "2,4,8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    val baseRoot = BenchHarness.tmpfsRoot
    val base = s"$baseRoot/graft-scale"
    Files.createDirectories(Paths.get(base))
    val cfg = IndexConfig(numSegments = 256, blockSize = 128)

    def session(cpus: Int): SparkSession =
      BenchHarness.session(s"graft-scale-$cpus", cpus, s"$base/spark-local")

    var spark = session(levels.max)
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = BenchHarness.stageCorpus(spark, base, docs)

    var lastDir: String = null
    var n = 0
    def build(cpus: Int): Double = {
      spark.stop()
      System.gc()
      spark = session(cpus)
      spark.sparkContext.setLogLevel("WARN")
      if (lastDir != null) BenchHarness.deleteDir(lastDir)
      n += 1
      val dir = Files.createTempDirectory(Paths.get(base), s"idx-$cpus-$n").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, spark.read.parquet(corpusDir), dir, cfg)
      lastDir = dir
      (System.nanoTime() - t0) / 1e9
    }

    // JIT warmup once at the highest level
    val warmDir = Files.createTempDirectory(Paths.get(base), "warm").toString
    IndexBuilder.build(spark,
      spark.read.parquet(corpusDir).limit(20000), warmDir, cfg)

    val times = scala.collection.mutable.Map.empty[Int, List[Double]]
    (1 to reps).foreach { _ =>
      levels.foreach { l =>
        val t = build(l)
        times(l) = t :: times.getOrElse(l, Nil)
        println(f"[scale] level=$l%-3d t=$t%7.1f s  tp=${docs / t}%9.0f docs/s")
      }
    }
    def med(xs: List[Double]) = BenchHarness.median(xs)
    val tp = levels.map(l => l -> docs / med(times(l))).toMap
    println("[scale] medians: " +
      levels.map(l => f"$l->${tp(l)}%.0f").mkString("  "))
    levels.foreach { a =>
      levels.filter(_ == a * 4).foreach { b =>
        println(f"[scale] efficiency $a%d->$b%d: ${tp(b) / tp(a) / 4.0}%.3f")
      }
    }
    spark.stop()
    scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
  }
}
