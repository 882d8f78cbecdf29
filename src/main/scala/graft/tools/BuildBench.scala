package graft.tools

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}

/** Focused index-build throughput harness: repeats the identical build at
  * each parallelism level (warmup + measured run) so JIT/page-cache effects
  * do not contaminate the N-vs-4N scaling comparison. With GRAFT_STAGES=1,
  * prints per-stage wall/max-task times to localize stragglers.
  * Usage: runMain graft.tools.BuildBench [docs] [cpuList] [reps] [segments] */
object BuildBench {

  private class StageLog extends SparkListener {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    private val taskCpu = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      taskMax.merge(t.stageId, t.taskInfo.duration, Math.max(_, _))
      taskCpu.merge(t.stageId, t.taskMetrics.executorCpuTime / 1000000, _ + _)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val info = s.stageInfo
      val wall = (for {st <- info.submissionTime; ct <- info.completionTime}
        yield ct - st).getOrElse(-1L)
      lines.add(f"stage ${info.stageId}%3d ${info.numTasks}%4d tasks " +
        f"wall ${wall / 1000.0}%7.2fs maxTask ${taskMax.getOrDefault(info.stageId, -1L) / 1000.0}%7.2fs " +
        f"cpuSum ${taskCpu.getOrDefault(info.stageId, 0L) / 1000.0}%8.2fs  ${info.name.takeWhile(_ != '\n').take(60)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(60000L)
    val cpus = args.lift(1).getOrElse("8,32").split(",").map(_.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val segments = args.lift(3).map(_.toInt).getOrElse(32)
    val stages = sys.env.contains("GRAFT_STAGES")

    val results = cpus.map { n =>
      val spark = BenchHarness.session(s"graft-buildbench-$n", n,
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      spark.sparkContext.setLogLevel("WARN")
      // corpus staged to parquet once (not timed): the metric is docs/sec
      // indexed from a stored table, and keeping generation out of the
      // measurement removes its CPU noise from the scaling comparison
      val tmpBase = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BB_TMP", "/tmp"))
      val corpusDir = tmpBase.resolve(s"graft-bb-corpus-$docs").toString
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusDir, "_SUCCESS"))) {
        Corpus.pages(spark, docs, seed = 42, numPartitions = 32)
          .select("url", "text").write.mode("overwrite").parquet(corpusDir)
      }
      val input = spark.read.parquet(corpusDir)
      // JIT warmup (not timed)
      val warmDir = Files.createTempDirectory(tmpBase, s"graft-bb-warm-$n").toString
      IndexBuilder.build(spark, input.limit(20000), warmDir,
        IndexConfig(numSegments = segments, blockSize = 128))
      val times = (1 to reps).map { r =>
        val listener = new StageLog
        if (stages) spark.sparkContext.addSparkListener(listener)
        val dir = Files.createTempDirectory(tmpBase, s"graft-bb-$n-$r").toString
        val t0 = System.nanoTime()
        IndexBuilder.build(spark, input, dir,
          IndexConfig(numSegments = segments, blockSize = 128))
        val sec = (System.nanoTime() - t0) / 1e9
        if (stages) {
          spark.sparkContext.removeSparkListener(listener)
          listener.lines.forEach(l => println(s"[stages][local[$n] rep$r] $l"))
        }
        println(f"[buildbench] local[$n] rep$r: $sec%.2f s  ${docs / sec}%.0f docs/s")
        // delete each rep's multi-GB index immediately — reps x levels of
        // them would otherwise fill the tmp dir (same hazard Bench guards)
        BenchHarness.deleteDir(dir)
        sec
      }
      BenchHarness.deleteDir(warmDir)
      spark.stop()
      val best = times.min
      n -> (docs / best)
    }
    results.foreach { case (n, tp) => println(f"[buildbench] local[$n] best: $tp%.0f docs/s") }
    if (results.size >= 2) {
      val eff = (results.last._2 / results.head._2) /
        (results.last._1.toDouble / results.head._1)
      println(f"[buildbench] scaling efficiency ${results.head._1}->${results.last._1}: $eff%.3f")
    }
  }
}
