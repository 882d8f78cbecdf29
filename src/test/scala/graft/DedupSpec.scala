package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dedup operator correctness: exact groups, n-gram Jaccard vs a naive
  * driver-side oracle, MinHash-LSH recall, SimHash banding recall. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  // corpus with planted duplicates: base docs + near-mutations + exact dups
  private lazy val docs = {
    val rng = new scala.util.Random(11)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    def text() = Seq.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, text()))
    val nearDups = base.take(8).map { case (i, t) =>
      val toks = t.split(" ").toBuffer
      toks(5) = "mutated" // single-token change -> high shingle overlap
      (100L + i, toks.mkString(" "))
    }
    val exactDups = base.take(4).map { case (i, t) => (200L + i, t) }
    (base ++ nearDups ++ exactDups).toDF("id", "text")
  }

  private def naiveJaccard(threshold: Double): Set[(Long, Long, Double)] = {
    val rows = docs.as[(Long, String)].collect()
    val sh = rows.map { case (id, t) => id -> Dedup.shingles(t, 3).toSet }.toMap
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= threshold
    } yield (a, b, math.rint(j * 1e6) / 1e6)).toSet
  }

  test("exact dedup finds planted exact duplicates") {
    val groups = Dedup.exactGroups(docs, "id", "text")
      .filter(col("n") > 1).collect()
    assert(groups.length === 4)
    groups.foreach(r => assert(r.getLong(1) === 2L))
  }

  test("empty/null texts yield empty shingle sets and NO near-dup pairs") {
    // "".split(" ") is Array("") — without the empty-set guard every pair
    // of empty docs would share the "" shingle at jaccard 1.0 (C(m,2)
    // blowup the prefix plan cannot prune)
    assert(Dedup.shingles("", 3).isEmpty)
    assert(Dedup.shingles("   ", 3).isEmpty)
    val mixed = Seq((1L, "alpha beta gamma delta"), (2L, ""), (3L, ""),
      (4L, null.asInstanceOf[String]), (5L, "alpha beta gamma delta epsilon"))
      .toDF("id", "text")
    Seq(
      Dedup.jaccardPairs(mixed, "id", "text", 3, 0.1),
      Dedup.jaccardPairsPrefix(mixed, "id", "text", 3, 0.1),
      Dedup.minhashLshPairs(mixed, "id", "text", 3, 64, 16, 0.1)).foreach { pairs =>
      val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 5L)), s"empty docs leaked pairs: $got")
    }
    // the MinHash guard must hold at the CANDIDATE stage, not just the
    // verified output: an empty shingle set has the degenerate all-MaxValue
    // signature, so m empty docs sharing it would put bands*C(m,2)
    // candidate rows through the bucket join before verify drops them.
    // Empty docs therefore get NO signature row at all.
    val sigs = Dedup.minhashSignatures(mixed, "id", "text", 3, 64)
      .select("id").as[Long].collect().toSet
    assert(sigs === Set(1L, 5L), s"empty docs got LSH signatures: $sigs")
  }

  test("n-gram Jaccard pairs equal the naive all-pairs oracle") {
    val got = Dedup.jaccardPairs(docs, "id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val expected = naiveJaccard(0.5)
    assert(got === expected)
    assert(got.nonEmpty, "planted near-dups must be found")
    // every planted near-dup pair (i, 100+i) present
    (0 until 8).foreach { i =>
      assert(got.exists(p => p._1 == i && p._2 == 100L + i), s"pair $i missing")
    }
  }

  test("prefix-filtered Jaccard == simple-join Jaccard, incl. under head skew") {
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val simple = Dedup.jaccardPairs(docs, "id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      val prefixed = Dedup.jaccardPairsPrefix(docs, "id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefixed === simple, s"threshold $t")
    }
    // plant a universal head shingle (every doc starts with the same 3
    // tokens -> a df == n_docs shingle) and require equality to hold — the
    // case the prefix filter exists for
    val skewed = docs.select(col("id"),
      concat(lit("zz zz zz "), col("text")).as("text"))
    val simple = Dedup.jaccardPairs(skewed, "id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val prefixed = Dedup.jaccardPairsPrefix(skewed, "id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(prefixed === simple)
    assert(simple.nonEmpty)
  }

  test("cost-based auto: same output, simple plan on bounded df, prefix under skew") {
    Seq(0.3, 0.5).foreach { t =>
      val auto = Dedup.jaccardPairsAuto(docs, "id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      val simple = Dedup.jaccardPairs(docs, "id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(auto === simple, s"threshold $t")
    }
    // this corpus's shingle dfs are bounded (pairs ≪ 8·rows) → the
    // selector must return the single-shuffle simple plan (no df-ordering
    // window, the prefix plan's structural marker)
    val planPlain = Dedup.jaccardPairsAuto(docs, "id", "text", 3, 0.5)
      .queryExecution.optimizedPlan.toString
    assert(!planPlain.contains("row_number"))
    // 30 identical docs: every shingle has df=30 → pairs/rows = 14.5 > 8
    // → prefix plan, and the output is still the full exact pair set
    val same = (0 until 30).map(i => (i.toLong, "aa bb cc dd ee ff gg hh"))
      .toDF("id", "text")
    val skewAuto = Dedup.jaccardPairsAuto(same, "id", "text", 3, 0.5)
    assert(skewAuto.queryExecution.optimizedPlan.toString.contains("row_number"))
    val got = skewAuto.as[(Long, Long, Double)].collect()
    assert(got.length === 30 * 29 / 2 && got.forall(_._3 === 1.0))
  }

  test("selector decision record: logged estimate == the aggregation's value") {
    // independent recompute of the decision statistic pairs = Σ df·(df−1)/2
    // over the SAME shingle table the selector aggregates
    def expect(d: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val dfs = Dedup.shingleTable(d, "id", "text", 3)
        .groupBy("shingle").count().as[(String, Long)].collect().map(_._2)
      (dfs.map(df => df.toDouble * (df - 1) / 2).sum, dfs.sum)
    }
    val (_, decPlain) = Dedup.jaccardPairsAutoDecided(docs, "id", "text", 3, 0.5)
    val (expPairs, expRows) = expect(docs)
    assert(decPlain.pairs === expPairs)
    assert(decPlain.rows === expRows)
    assert(!decPlain.usePrefix && decPlain.pairs <= decPlain.budget)
    assert(decPlain.describe.contains("simple single-shuffle join"))

    val same = (0 until 30).map(i => (i.toLong, "aa bb cc dd ee ff gg hh"))
      .toDF("id", "text")
    val (_, decSkew) = Dedup.jaccardPairsAutoDecided(same, "id", "text", 3, 0.5)
    val (skPairs, skRows) = expect(same)
    assert(decSkew.pairs === skPairs)
    assert(decSkew.rows === skRows)
    assert(decSkew.usePrefix && decSkew.pairs > decSkew.budget)
    // 6 distinct shingles x C(30,2) each
    assert(skPairs === 6.0 * (30 * 29 / 2))
  }

  test("prefix-filtered Jaccard keeps exact-boundary pairs (float slack)") {
    // B's 7 shingles ⊂ A's 25 → J = 7/25 = 0.28 exactly. The size-ratio
    // prune computes 0.28*25 = 7.000000000000001 in doubles; without the
    // 1e-6 slack `least(7) >= t*greatest` silently drops the pair the
    // exact filter keeps, breaking prefixed == simple at the boundary.
    val aTokens = (0 until 27).map(i => s"w$i")
    val boundary = Seq(
      (1L, aTokens.mkString(" ")),           // 25 shingles
      (2L, aTokens.take(9).mkString(" "))    // 7 shingles, all ⊂ A
    ).toDF("id", "text")
    val simple = Dedup.jaccardPairs(boundary, "id", "text", 3, 0.28)
      .as[(Long, Long, Double)].collect().toSet
    val prefixed = Dedup.jaccardPairsPrefix(boundary, "id", "text", 3, 0.28)
      .as[(Long, Long, Double)].collect().toSet
    assert(simple === Set((1L, 2L, 0.28)))
    assert(prefixed === simple)
  }

  test("MinHash-LSH pairs: exact precision, full recall on this corpus") {
    val lsh = Dedup.minhashLshPairs(docs, "id", "text", 3, 64, 16, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val exact = naiveJaccard(0.5)
    // precision is exact by construction (verify step); recall must be 1.0
    // here because planted dups have jaccard >= 0.8 and 16 bands x 4 rows
    // catches those with probability ~1
    assert(lsh === exact)
  }

  test("SimHash: identical docs collide, near-dups within small Hamming") {
    val pairs = Dedup.simhashPairs(docs, "id", "text", 3)
      .as[(Long, Long, Int)].collect()
    // exact dups have Hamming 0
    (0 until 4).foreach { i =>
      assert(pairs.exists(p => p._1 == i && p._2 == 200L + i && p._3 == 0),
        s"exact dup $i not at Hamming 0")
    }
  }

  test("simhash64 is deterministic and content-sensitive") {
    assert(Dedup.simhash64("a b c") === Dedup.simhash64("a b c"))
    assert(Dedup.simhash64("a b c") !== Dedup.simhash64("x y z"))
  }

  test("wide (Manku 6-block) simhash banding == 4x16 banding, exactly") {
    // both schemes are pigeonhole-exact at Hamming <= 3, so their outputs
    // must be IDENTICAL row sets — the wide plan only changes candidate
    // volume, never the answer
    val narrow = Dedup.simhashPairs(docs, "id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    val wide = Dedup.simhashPairsWide(docs, "id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(wide === narrow)
    assert(narrow.nonEmpty) // the planted exact dups guarantee pairs exist
    // brute-force ground truth on the driver over all signature pairs
    val sigs = docs.select(col("id"), Dedup.simhashUdf(col("text")).as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(narrow === brute)
    // the ground truth must contain at least one NEAR pair (1 <= h <= 3):
    // with only exact dups (h=0) a banding bug that catches identical
    // signatures alone would pass every assertion above
    assert(brute.exists(p => p._3 >= 1 && p._3 <= 3),
      "fixture regression: no Hamming-1..3 pair planted in the corpus")
  }
}
