package graft

import org.apache.spark.sql.functions._

import graft.ops.SimSearch

/** Similarity-search correctness: brute-force cosine vs driver-side oracle;
  * ANN recall on clustered vectors. */
class SimSearchSpec extends SparkSuite {
  import spark.implicits._

  // clustered vectors: 10 centers, 20 points each, mild noise
  private lazy val vectors: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(5)
    val dim = 32
    val centers = Array.fill(10)(Array.fill(dim)(rng.nextGaussian()))
    (0 until 200).map { i =>
      val c = centers(i % 10)
      val v = c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat)
      (i.toLong, v)
    }
  }
  private lazy val emb = vectors.toDF("vec_id", "embedding")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def naiveTopK(probe: Long, k: Int): Seq[Long] = {
    val pv = vectors.find(_._1 == probe).get._2
    vectors.filter(_._1 != probe)
      .map { case (id, v) => (id, math.rint(cosine(v, pv) * 1e6) / 1e6) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
  }

  test("brute-force cosine top-k matches the naive oracle") {
    val got = SimSearch.cosineTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 10)
      .orderBy("probe_id", "rnk")
      .as[(Long, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    (0L until 5L).foreach { p =>
      assert(got(p) === naiveTopK(p, 10), s"probe $p")
    }
  }

  test("near-dup pairs equal brute force exactly (completeness + precision)") {
    // brute-force reference over every unordered pair
    def brute(threshold: Double): Set[(Long, Long, Double)] =
      (for {
        i <- vectors.indices
        j <- (i + 1) until vectors.size
        c = math.rint(cosine(vectors(i)._2, vectors(j)._2) * 1e6) / 1e6
        if c >= threshold
      } yield (vectors(i)._1, vectors(j)._1, c)).toSet
    // several thresholds, including a low one where the candidate prune
    // must still be lossless, and several block counts (more blocks than
    // rows included)
    for (t <- Seq(0.9, 0.5, 0.2); k <- Seq(1, 4, 16, 512)) {
      val got = SimSearch.nearDupPairs(emb, "vec_id", "embedding", t, numBlocks = k)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === brute(t), s"threshold=$t blocks=$k")
    }
  }

  test("near-dup plan has no cartesian/broadcast-nested-loop join") {
    val p = SimSearch.nearDupPairs(emb, "vec_id", "embedding", 0.5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH ANN achieves >=0.6 recall@10 on clustered vectors") {
    val probes = emb.filter(col("vec_id") < 20)
    val ann = SimSearch.annTopK(emb, probes, "vec_id", "embedding", 10,
        planes = 10, tables = 8)
      .as[(Long, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 20L).map { p =>
      val truth = naiveTopK(p, 10).toSet
      val found = ann.getOrElse(p, Set.empty)
      truth.intersect(found).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 = $mean")
  }

  test("IVF ANN achieves >=0.6 recall@10 on clustered vectors") {
    val probes = emb.filter(col("vec_id") < 20)
    val ivf = SimSearch.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nlist = 20, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 20L).map { p =>
      val truth = naiveTopK(p, 10).toSet
      val found = ivf.getOrElse(p, Set.empty)
      truth.intersect(found).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 = $mean")
  }

  test("IVF rejects non-integral id columns loudly (no silent null cast)") {
    val strIds = vectors.map { case (id, v) => (s"url://$id", v) }
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimSearch.ivfTopK(strIds, strIds, "vec_id", "embedding", 5)
    }
    assert(e.getMessage.contains("integral id column"))
    // probe-side-only string ids must fail just as loudly — a silent long
    // cast would null them out and return 0 rows with no error
    val intIds = vectors.toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      SimSearch.ivfTopK(intIds, strIds, "vec_id", "embedding", 5)
    }
    assert(e2.getMessage.contains("integral id column"))
  }

  test("IVF assignment is a partition: each vector lands in exactly one cell") {
    // candidates therefore need no distinct() — assert the plan has none
    // beyond the window top-k, and that the same probe never sees a
    // duplicate neighbor
    val got = SimSearch.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", 200, nlist = 10, nprobe = 10)
      .as[(Long, Long, Int, Double)].collect()
    val dup = got.groupBy(r => (r._1, r._2)).filter(_._2.length > 1)
    assert(dup.isEmpty, s"duplicate (probe, nbr) rows: ${dup.keys.take(5)}")
  }

  test("null embedding rows are dropped, never a task-killing NPE") {
    // one corrupt row must not abort the corpus (same convention as
    // Dedup's null text): every entry point filters null vectors from
    // both sides before any arithmetic or centroid/bucket derivation
    val withNull = (vectors :+ (999L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val probes = vectors.take(3).toDF("vec_id", "embedding")
    val clean = vectors.toDF("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "nbr_id", "rnk").as[(Long, Long, Int)]
        .collect().toSet
    assert(ids(SimSearch.cosineTopK(withNull, probes, "vec_id", "embedding", 5)) ===
      ids(SimSearch.cosineTopK(clean, probes, "vec_id", "embedding", 5)))
    assert(ids(SimSearch.ivfTopK(withNull, probes, "vec_id", "embedding", 5)) ===
      ids(SimSearch.ivfTopK(clean, probes, "vec_id", "embedding", 5)))
    assert(ids(SimSearch.annTopK(withNull, probes, "vec_id", "embedding", 5)) ===
      ids(SimSearch.annTopK(clean, probes, "vec_id", "embedding", 5)))
    val pairs = SimSearch.nearDupPairs(withNull, "vec_id", "embedding", 0.9)
    val cleanPairs = SimSearch.nearDupPairs(clean, "vec_id", "embedding", 0.9)
    assert(pairs.count() === cleanPairs.count())
  }
}
