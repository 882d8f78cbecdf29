package graft

import org.apache.spark.sql.functions._

import graft.functions.Scoring

/** Pins the reference's scalar score transforms to the exact float goldens
  * in /root/reference/tests/test_score.py (renormalize :62-80, p-value
  * :84-102, sigmoid :104-118). */
class ScoringSpec extends SparkSuite {
  import spark.implicits._

  test("renormalize goldens") {
    assert(Scoring.renormalize(0.2, (0.0, 0.9), (0.5, 1.0)) === 0.6111111111111112)
    assert(Scoring.renormalize(2, (0.0, 0.9), (0.5, 1.0)) === 1.0)
    assert(Scoring.renormalize(2, (0.0, 0.9), (0.5, 1.0), cap = false) === 1.6111111111111112)
    assert(Scoring.renormalize(-0.2, (0.0, 0.9), (0.5, 1.0)) === 0.5)
    assert(Scoring.renormalize(-0.2, (0.0, 0.9), (0.5, 1.0), cap = false) === 0.3888888888888889)
    assert(Scoring.renormalize(10, (1, 100000), (0.0, 1.0)) === 9.000090000900009e-05)
    assert(Scoring.renormalize(1, (1, 100000), (0.0, 1.0)) === 0.0)
    assert(Scoring.renormalize(100005, (1, 100000), (0.0, 1.0)) === 1.0)
    assert(Scoring.renormalize(2500.0, (0, 5000), (0.0, 1.0)) === 0.5)
  }

  test("p-value transform goldens") {
    assert(Scoring.pValueToScoreLinear(1) === 0.0)
    assert(Scoring.pValueToScoreLinear(10) === 0.0)
    assert(Scoring.pValueToScoreLinear(1e-10) === 1.0)
    assert(Scoring.pValueToScoreLinear(1e-30) === 1.0)
    assert(Scoring.pValueToScoreLinear(1e-5) === 0.5)
    assert(Scoring.pValueToScoreLinear(1e-2, rangeMin = 1e-2) === 0.0)
    assert(Scoring.pValueToScoreLinear(1e-10, rangeMin = 1e-2) === 1.0)
    assert(Scoring.pValueToScoreLinear(1, rangeMin = 1e-2) === 0.0)
    assert(Scoring.pValueToScoreLinear(1e-5, rangeMin = 1e-2, rangeMax = 1e-6) === 0.75)
  }

  test("sigmoid scaling goldens") {
    assert(Scoring.sigmoidScaling(1) === 1.0)
    assert(Scoring.sigmoidScaling(100) === 0.542)
    assert(Scoring.sigmoidScaling(1000) === 0.0)
    assert(Scoring.sigmoidScaling(100, precision = 6) === 0.541824)
    assert(Scoring.sigmoidScaling(100, midValue = 10) === 0.0)
  }

  test("column expressions match the Scala functions") {
    val vals = Seq(0.2, 2.0, -0.2, 0.5, 250.0, 499.99).toDF("v")
    val rows = vals.select(
      col("v"),
      Scoring.renormalizeExpr(col("v"), (0.0, 0.9), (0.5, 1.0)).as("rn"),
      Scoring.pValueToScoreExpr(abs(col("v")) / 1000.0).as("pv"),
      Scoring.sigmoidScalingExpr(col("v")).as("sg")).collect()
    rows.foreach { r =>
      val v = r.getDouble(0)
      assert(r.getDouble(1) === Scoring.renormalize(v, (0.0, 0.9), (0.5, 1.0)))
      assert(r.getDouble(2) === Scoring.pValueToScoreLinear(math.abs(v) / 1000.0))
      assert(r.getDouble(3) === Scoring.sigmoidScaling(v))
    }
  }

  test("canonical id: key-order independent, null fields serialized") {
    val df = Seq((1L, "a"), (1L, "a")).toDF("x", "y")
    val ids = df.select(Scoring.canonicalId("x" -> col("x"), "y" -> col("y"))).collect()
    assert(ids(0) === ids(1))
    // sort_keys=True semantics: call-site order must not matter
    val swapped = df.select(Scoring.canonicalId("y" -> col("y"), "x" -> col("x"))).collect()
    assert(swapped(0) === ids(0))
    // a null field must participate in the id ({a:1,b:null} != {a:1,b:"a"})
    val withNull = Seq((1L, null: String)).toDF("x", "y")
      .select(Scoring.canonicalId("x" -> col("x"), "y" -> col("y"))).collect()
    assert(withNull(0) !== ids(0))
    // and two rows differing only in WHICH field is null must not collide
    val n1 = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
    val n2 = Seq((None: Option[Long], Some(1L))).toDF("x", "y")
    val h1 = n1.select(Scoring.canonicalId("x" -> col("x"), "y" -> col("y"))).head()
    val h2 = n2.select(Scoring.canonicalId("x" -> col("x"), "y" -> col("y"))).head()
    assert(h1 !== h2)
  }
}
