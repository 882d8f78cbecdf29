package graft

import org.apache.spark.sql.functions._

import graft.ops.HarmonicSum

/** Pins the reference's exact harmonic-sum float semantics
  * (mrtarget/tests/test_score.py:39-41). */
class HarmonicSumSpec extends SparkSuite {
  import spark.implicits._

  test("reference golden: 100 x 1.0 at scale 2 = 1.6349839001848923") {
    assert(HarmonicSum.exact(Seq.fill(100)(1.0), 100, 2.0) === 1.6349839001848923)
  }

  test("reference golden: 100 x 1.0 at scale 1 = 5.187377517639621") {
    assert(HarmonicSum.exact(Seq.fill(100)(1.0), 100, 1.0) === 5.187377517639621)
  }

  test("buffer caps the contributing values") {
    // 200 ones, buffer 100: identical to 100 ones
    assert(HarmonicSum.exact(Seq.fill(200)(1.0), 100, 2.0) ===
      HarmonicSum.exact(Seq.fill(100)(1.0), 100, 2.0))
  }

  test("distributed Aggregator equals driver-side exact computation") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (i % 13, rng.nextDouble() * 10))
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(HarmonicSum.column(100, 2.0)(col("v")).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expected = rows.groupBy(_._1).view
      .mapValues(vs => HarmonicSum.exact(vs.map(_._2), 100, 2.0)).toMap
    expected.foreach { case (k, e) =>
      assert(math.abs(got(k) - e) < 1e-12, s"key $k")
    }
  }

  test("order-insensitive: shuffled input gives the same result") {
    val vs = (1 to 300).map(_.toDouble / 7)
    val shuffler = new scala.util.Random(77) // seeded: failures reproducible
    assert(HarmonicSum.exact(vs, 100, 2.0) ===
      HarmonicSum.exact(shuffler.shuffle(vs), 100, 2.0))
  }
}
