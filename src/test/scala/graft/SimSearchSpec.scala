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

  test("near-dup pairs are exact and symmetric-free (a<b)") {
    val pairs = SimSearch.nearDupPairs(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "clustered vectors must have close pairs")
    pairs.foreach { case (a, b, c) =>
      assert(a < b)
      assert(math.abs(c - math.rint(cosine(vectors(a.toInt)._2,
        vectors(b.toInt)._2) * 1e6) / 1e6) < 1e-9)
    }
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
}
