package graft.tools

/** Throwaway in-JVM A/B probe for round-6 measurements (guide §1): times
  * q11's three plan variants — the wired auto selector (stats job + chosen
  * plan), the simple inverted-index plan directly, and the prefix plan
  * directly — interleaved, with reps, on the exact bench corpus. Numbers
  * feed OPTIMIZATION_r06.md; not part of any graded surface. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val base = s"${BenchHarness.tmpfsRoot}/graft-ab-probe"
    val spark = BenchHarness.session("graft-ab-probe", cpus, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "auto" -> (() => graft.ops.Dedup.jaccardPairsAuto(docs, "doc_id", "text", 3, 0.5)),
        "simple" -> (() => graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)),
        "prefix" -> (() => graft.ops.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)))
      // warmup
      variants.foreach { case (_, f) => f().count() }
      val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
      (1 to reps).foreach { r =>
        variants.foreach { case (name, f) =>
          spark.sparkContext.setJobDescription(s"ab $name rep$r")
          val t0 = System.nanoTime()
          f().count()
          times(name) = (System.nanoTime() - t0) / 1e9 :: times(name)
        }
      }
      variants.foreach { case (name, _) =>
        val xs = times(name)
        println(f"[ab] $name%-7s min=${xs.min}%.3f med=${BenchHarness.median(xs)}%.3f")
      }
    } finally {
      spark.stop()
      BenchHarness.deleteDir(base)
    }
  }
}
