package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline: probes broadcast
  * against the full table, the dot product a primitive-loop UDF (see
  * `cosineFast` — the codegen HOF form allocates per pair and loses 10x).
  * The LSH variant (random-hyperplane sign buckets) is the scale path:
  * candidates come from bucket equi-joins, exact cosine re-ranks only the
  * candidates. Same blocking-key shape as the reference's d2d similarity
  * join (mrtarget/modules/DataDrivenRelation.py:212-216). */
object SimSearch {

  /** Σ a_i*b_i in double precision, left-to-right (codegen, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Tight-loop cosine for the all-pairs hot path: the higher-order-function
    * form allocates an intermediate array per pair (zip_with), which at
    * millions of pairs dominates; a primitive loop UDF is ~10x faster and
    * keeps the identical left-to-right double accumulation order. */
  private val cosineLoop = udf { (a: Array[Double], b: Array[Double]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  def cosineFast(a: Column, b: Column): Column = cosineLoop(a, b)

  /** Exact brute-force cosine top-k neighbors for each probe row.
    * `emb` and `probes` both need (idCol, vecCol); vectors are cast to
    * double before any arithmetic so accumulation is pure f64. Ranking uses
    * the 6-dp-rounded score (ties then broken by neighbor id) so results
    * are reproducible across engines and summation orders. */
  def cosineTopK(emb: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val e = emb.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("v"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val scored = e.crossJoin(broadcast(p))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("cos", round(cosineFast(col("v"), col("pv")), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "nbr_id", "rnk", "cos")
  }

  /** All pairs (a<b) with cosine >= threshold — embedding near-dup dedup.
    * Exact; `filterExpr` lets callers bound the candidate set (e.g. sampled
    * ids) so the O(n²) stays sane per partition-block at bench scale. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosineFast(col("a.v"), col("b.v")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic random hyperplanes: component h of plane p is a
    * hash-derived standard-ish uniform in [-1, 1). */
  private def hyperplane(planeIdx: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = graft.index.Hashing.hash64(s"plane:$planeIdx:$d")
      (h.toDouble / Long.MaxValue.toDouble)
    }

  /** LSH-bucketed approximate top-k: sign-pattern of `planes` hyperplanes
    * forms the bucket key; exact cosine re-ranks candidates sharing the
    * probe's bucket in any of `tables` independent hash tables. */
  def annTopK(emb: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val planeVecs: Array[Array[Array[Double]]] = Array.tabulate(tables, planes) {
      (t, p) => hyperplane(t * planes + p, dim)
    }
    val bucketUdf = udf { (v: Seq[Double], table: Int) =>
      val ps = planeVecs(table)
      var key = 0L
      var p = 0
      while (p < ps.length) {
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d) * ps(p)(d); d += 1 }
        if (s >= 0) key |= (1L << p)
        p += 1
      }
      key
    }
    def bucketed(df: DataFrame, ic: String): DataFrame =
      df.select(col(ic), col("v"),
          explode(sequence(lit(0), lit(tables - 1))).as("tbl"))
        .withColumn("bucket", bucketUdf(col("v"), col("tbl")))

    val e = bucketed(emb.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("v")), "nbr_id")
    val p = bucketed(probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("v")), "probe_id")
      .withColumnRenamed("v", "pv")

    val cand = e.join(p, Seq("tbl", "bucket"))
      .filter(col("nbr_id") =!= col("probe_id"))
      .select("probe_id", "pv", "nbr_id", "v")
      .distinct()
      .withColumn("cos", round(cosineFast(col("v"), col("pv")), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "nbr_id", "rnk", "cos")
  }
}
