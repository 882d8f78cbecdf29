package graft

import org.apache.spark.sql.functions._

import graft.ops.DataDrivenRelation

/** Reference d2d similarity-join semantics (J9): weight = df/n, sim =
  * sqrt(Σ∩w / Σ∪w), lossless ratio prune — vs a naive driver oracle. */
class DdrSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = {
    val rng = new scala.util.Random(3)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j",
      "k", "l", "m", "n", "o", "p")
    (0 until 60).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }.toDF("id", "text")
  }

  private def naive(threshold: Double): Map[(Long, Long), Double] = {
    val rows = docs.as[(Long, String)].collect()
    val sets = rows.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val n = rows.length.toDouble
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val w = df.map { case (t, d) => t -> d / n }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      iw = sa.intersect(sb).iterator.map(w).sum
      uw = sa.union(sb).iterator.map(w).sum
      sim = math.rint(math.sqrt(iw / uw) * 1e6) / 1e6
      if sim >= threshold
    } yield (a, b) -> sim).toMap
  }

  test("pairs and similarities equal the naive oracle at threshold 0.19") {
    val got = DataDrivenRelation.weightedOverlapPairs(docs, "id", "text", 0.19)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expected = naive(0.19)
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9, k) }
  }

  test("prefix blocking is lossless under extreme head-token skew") {
    // every doc shares the universal tokens; near-dup pairs overlap ONLY on
    // heavy tokens — the worst case for rare-first prefix filtering
    val skewed = ((0 until 40).map { i =>
      (i.toLong, s"the of and un$i")           // unique tail token each
    } ++ Seq((100L, "the of and"), (101L, "the of and"),  // identical heads-only
      (102L, "the of and x1 x2"), (103L, "the of and x1 x2")))
      .toDF("id", "text")
    val rows = skewed.as[(Long, String)].collect()
    val sets = rows.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val n = rows.length.toDouble
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val w = df.map { case (t, d) => t -> d / n }
    def naiveSkew(threshold: Double): Set[(Long, Long)] =
      (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
        iw = sa.intersect(sb).iterator.map(w).sum
        uw = sa.union(sb).iterator.map(w).sum
        if math.rint(math.sqrt(iw / uw) * 1e6) / 1e6 >= threshold
      } yield (a, b)).toSet
    Seq(0.5, 0.9).foreach { t =>
      val got = DataDrivenRelation.weightedOverlapPairs(skewed, "id", "text", t)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
      assert(got === naiveSkew(t), s"threshold=$t")
    }
  }

  test("prune is lossless at a high threshold too") {
    val got = DataDrivenRelation.weightedOverlapPairs(docs, "id", "text", 0.8)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got === naive(0.8).keySet)
  }
}
