package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tools.BenchHarness.timed
import graft.index.Hashing
import graft.ops.SimSearch

/** ANN scale smoke: half a million deterministic clustered vectors, exact
  * brute-force top-k vs the IVF-flat path, one JSON line with timings and
  * measured recall. The point is evidence, not a pass/fail gate: the
  * similarity family's scale claims (sampled-centroid coarse quantizer,
  * shuffle-free assignment, nprobe-bounded candidate volume) get a
  * measured data point well beyond the sf tables' 500-2000 vectors.
  *
  * Vectors are pure functions of their id (splitmix64 via Hashing.hash64):
  * id belongs to cluster id%clusters; vector = center + 0.1 * noise. No
  * randomness, no data files — reruns are bit-identical.
  * Usage: runMain graft.tools.AnnSmoke [nVectors] */
object AnnSmoke {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val clusters = 200
    val nlist = 256
    val nprobe = 8
    val k = 10
    val nProbes = 10

    val spark = Sessions.withMaster(SparkSession.builder(), "local[32]")
      .appName("graft-ann-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def unit(s: String): Double = Hashing.hash64(s).toDouble / Long.MaxValue
    val vecUdf = udf { (id: Long) =>
      val c = id % clusters
      Array.tabulate(Dim)(d => unit(s"c:$c:$d") + 0.1 * unit(s"n:$id:$d"))
    }
    val emb = spark.range(n)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
      .cache()
    emb.count() // materialize: measure search, not synthesis
    val probes = emb.filter(col("vec_id") < nProbes).cache()
    probes.count()


    val (brute, bruteSec) = timed {
      SimSearch.cosineTopK(emb, probes, "vec_id", "embedding", k)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val (ivf, ivfSec) = timed {
      SimSearch.ivfTopK(emb, probes, "vec_id", "embedding", k,
          nlist = nlist, nprobe = nprobe)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val recalls = (0L until nProbes.toLong).map { p =>
      val truth = brute.getOrElse(p, Set.empty)
      if (truth.isEmpty) 1.0
      else truth.intersect(ivf.getOrElse(p, Set.empty)).size.toDouble / truth.size
    }
    val recall = recalls.sum / recalls.size

    // amortization evidence: brute cost is linear in probe count (each
    // probe scans all n vectors); IVF pays a one-time O(n*nlist*dim)
    // assignment and then ~nprobe/nlist of the table per probe — so at few
    // probes brute can win, and at many probes IVF must stay ~flat while
    // brute extrapolates linearly. 100x the probes makes that visible.
    val manyProbes = emb.filter(col("vec_id") < nProbes * 100).cache()
    manyProbes.count()
    val (_, ivfManySec) = timed {
      SimSearch.ivfTopK(emb, manyProbes, "vec_id", "embedding", k,
        nlist = nlist, nprobe = nprobe).count()
    }

    println(f"""{"annsmoke_vectors":$n,"dim":$Dim,"clusters":$clusters,""" +
      f""""nlist":$nlist,"nprobe":$nprobe,"k":$k,"probes":$nProbes,""" +
      f""""brute_sec":$bruteSec%.2f,"ivf_sec":$ivfSec%.2f,""" +
      f""""probes_many":${nProbes * 100},"ivf_many_sec":$ivfManySec%.2f,""" +
      f""""brute_many_sec_extrapolated":${bruteSec * 100}%.0f,""" +
      f""""recall_at_$k":$recall%.3f}""")
    spark.stop()
  }
}
