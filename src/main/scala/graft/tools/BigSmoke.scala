package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.search.IndexHandle

/** Large-corpus robustness smoke: build N docs (default 8M) at P segments,
  * report throughput, per-posting byte cost, segment balance, and verify a
  * query answers sanely. One JSON line on stdout.
  * Usage: runMain graft.tools.BigSmoke [docs] [segments] */
object BigSmoke {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(8000000L)
    val segments = args.lift(1).map(_.toInt).getOrElse(512)
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val base = sys.env.getOrElse("GRAFT_SMOKE_TMP", BenchHarness.tmpfsRoot) + "/graft-bigsmoke"
    Files.createDirectories(Paths.get(base))
    val spark = Sessions.withMaster(SparkSession.builder(), "local[32]")
      .appName("graft-bigsmoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpusDir = s"$base/corpus-$docs"
      if (!Files.exists(Paths.get(corpusDir, "_SUCCESS")))
        Corpus.pages(spark, docs, seed = 42, numPartitions = 64)
          .select("url", "text").write.mode("overwrite").parquet(corpusDir)
      val input = spark.read.parquet(corpusDir)
      val idxDir = Files.createTempDirectory(Paths.get(base), "idx").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, idxDir,
        IndexConfig(numSegments = segments, blockSize = 128))
      val sec = (System.nanoTime() - t0) / 1e9
      val snap = Snapshot.latest(idxDir).get
      val postings = snap.segments.map(_.postings).sum
      val segDocs = snap.segments.map(_.docs)
      val idxBytes = {
        val walk = Files.walk(Paths.get(idxDir))
        try walk.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum()
        finally walk.close()
      }
      val h = new IndexHandle(spark, idxDir)
      val hits = h.topK("the data crawl", 10)
      h.close()
      println(f"""{"bigsmoke_docs":$docs,"segments":$segments,"build_sec":$sec%.1f,"docs_per_sec":${docs / sec}%.0f,"postings":$postings,"index_bytes":$idxBytes,"bytes_per_posting":${idxBytes.toDouble / postings}%.2f,"min_docs_per_seg":${segDocs.min},"max_docs_per_seg":${segDocs.max},"top1_score":${hits.head.score},"hits":${hits.length}}""")
    } finally {
      spark.stop()
      BenchHarness.deleteDir(base)
    }
  }
}
