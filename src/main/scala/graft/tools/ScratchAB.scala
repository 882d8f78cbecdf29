package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway A/B harness for round-6 optimization experiments (not part
  * of any contract; delete when the round closes). */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val base = s"${BenchHarness.tmpfsRoot}/graft-scratch"
    val spark = BenchHarness.session("graft-scratch", cpus, s"$base/spark-local")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed(label: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[ab] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }

    // A: current jaccardPairs (sized join)
    timed("join   ")(graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    // B: selector overhead alone
    timed("auto   ")(graft.ops.Dedup.jaccardPairsAuto(docs, "doc_id", "text", 3, 0.5).count())

    val shingles = udf((text: String, n: Int) => {
      val sh = graft.ops.Dedup.shingles(if (text == null) "" else text, n)
      sh.map(s => (s, sh.length))
    })
    def sh = docs.select(col("doc_id").as("id"),
        explode(shingles(col("text"), lit(3))).as("e"))
      .select(col("id"), col("e._2").as("sz"), col("e._1").as("shingle"))
    // C: tokenize+explode alone
    timed("sh     ")(sh.count())
    // D: the self-join without the aggregation
    timed("joinraw")(sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id")).count())
    // E: inverted-index pair generation (1 scan, 2 exchanges, no join)
    val pairsUdf = udf { (g: Seq[org.apache.spark.sql.Row]) =>
      val arr = g.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int)]
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          out += ((arr(i)._1, arr(j)._1, arr(i)._2, arr(j)._2)); j += 1
        }
        i += 1
      }
      out.toArray
    }
    def inv = sh.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("sz"))).as("g"))
      .select(explode(pairsUdf(col("g"))).as("p"))
      .groupBy(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("sza"), col("p._4").as("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    timed("invidx ")(inv.count())

    spark.stop()
    BenchHarness.deleteDir(base)
  }
}
