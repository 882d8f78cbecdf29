package graft.tools

import org.apache.spark.sql.expressions.Window
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
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = docs0.filter(col("doc_id") < 500)

    def timed(label: String)(f: => Long): Unit = {
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[ab] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }

    timed("full   ")(graft.ops.DataDrivenRelation
      .weightedOverlapPairs(docs, "doc_id", "text", 0.9).count())

    val n = docs.count().toDouble
    val tEff = 0.9 - 1e-6
    val c = tEff * tEff / (1.0 + tEff * tEff)
    val toks = docs.select(col("doc_id").as("id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val weights = toks.groupBy("tok").agg((count(lit(1)) / lit(n)).as("w"))
    def tw = toks.join(weights, "tok")
    timed("tw     ")(tw.count())
    val ord = Window.partitionBy(col("id")).orderBy(col("w").asc, col("tok").asc)
    def cum = tw
      .withColumn("ws", sum("w").over(Window.partitionBy(col("id"))))
      .withColumn("cum", sum("w").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    timed("cum    ")(cum.count())
    def prefix = cum
      .filter(col("ws") - col("cum") + col("w") >= lit(c) * col("ws"))
      .select("id", "tok", "ws")
    val pairsUdf = udf { (ids: Array[Long], wss: Array[Double]) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
      var i = 0
      while (i < ids.length) {
        var j = i + 1
        while (j < ids.length) {
          if (ids(i) != ids(j)) out += ((ids(i), ids(j), wss(i), wss(j)))
          j += 1
        }
        i += 1
      }
      out.toArray
    }.asNondeterministic()
    def candidates = prefix.groupBy("tok")
      .agg(collect_list(struct(col("id").cast("long").as("id"), col("ws"))).as("g"))
      .select(explode(pairsUdf(
        transform(sort_array(col("g")), x => x.getField("id")),
        transform(sort_array(col("g")), x => x.getField("ws")))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("wsa"), col("p._4").as("wsb"))
      .distinct()
    timed("cand   ")(candidates.count())
    val ratioBound = (1.0 / tEff) * (1.0 / tEff)
    def pruned = candidates.filter(
      greatest(col("wsa"), col("wsb")) / least(col("wsa"), col("wsb")) < lit(ratioBound))
    def inter = pruned
      .join(tw.select(col("id").as("id_a"), col("tok")), "id_a")
      .join(tw.select(col("id").as("id_b"), col("tok"), col("w")), Seq("id_b", "tok"))
      .groupBy("id_a", "id_b", "wsa", "wsb")
      .agg(sum(col("w")).as("iw"))
    timed("inter  ")(inter.count())

    spark.stop()
    BenchHarness.deleteDir(base)
  }
}
