package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.Bm25

/** Exact float goldens in the style of the reference's tests/test_score.py
  * (which pins e.g. harmonic sum of 100×1.0 = 5.187377517639621). */
class Bm25Spec extends AnyFunSuite {

  test("idf matches ES 7.4 formula exactly") {
    assert(Bm25.idf(1000, 10) === 4.557379522151743)
    assert(Bm25.idf(3, 2) === 0.47000362924573563)
  }

  test("tfNorm matches k1=1.2 b=0.75 exactly") {
    assert(Bm25.tfNorm(3, 120, 95.5) === 1.4895427153491672)
  }

  test("full score = idf * tfNorm") {
    assert(Bm25.idf(1000, 10) * Bm25.tfNorm(3, 120, 95.5) === 6.788411468302598)
  }

  test("avgdl is exact integer division") {
    assert(Bm25.avgdl(4, 10) === 2.5)
  }

  test("tfNorm is monotone in tf and bounded by k1+1") {
    val a = Bm25.tfNorm(1, 100, 100)
    val b = Bm25.tfNorm(5, 100, 100)
    val c = Bm25.tfNorm(500, 100, 100)
    assert(a < b && b < c && c < Bm25.tfNormUpperBound)
  }
}
