package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Normalize

/** Goldens for the reference's NFKD->ascii fold (Drug.py:116-123 —
  * unicodedata.normalize('NFKD', v).encode('ascii','ignore')) and the
  * SaferCast fallback family (safercast.py:7-89). */
class NormalizeSpec extends AnyFunSuite {

  test("accents strip to ascii") {
    assert(Normalize.nfkdAscii("Crème-Brûlée") === "Creme-Brulee")
    assert(Normalize.nfkdAscii("Ångström île façade") === "Angstrom ile facade")
    assert(Normalize.nfkdAscii("ñoño ü") === "nono u")
  }

  test("compat decompositions unfold; undecomposable non-ascii drops") {
    assert(Normalize.nfkdAscii("ﬁn") === "fin")      // ligature fi -> fi
    assert(Normalize.nfkdAscii("№5") === "No5")      // numero sign -> No
    assert(Normalize.nfkdAscii("½") === "12")        // vulgar fraction (NFKD: 1⁄2, frasl dropped)
    assert(Normalize.nfkdAscii("œuvre") === "uvre")  // œ has no compat mapping: dropped
    assert(Normalize.nfkdAscii("Øre") === "re")      // ø likewise
    assert(Normalize.nfkdAscii("日本") === "")        // non-latin: dropped entirely
  }

  test("null and ascii passthrough") {
    assert(Normalize.nfkdAscii(null) === null)
    assert(Normalize.nfkdAscii("plain ascii-123") === "plain ascii-123")
  }
}

/** SaferCast columns need a session — piggyback on the shared suite. */
class SaferCastSpec extends SparkSuite {
  import spark.implicits._

  test("saferDouble/saferLong fall back on uncastable input") {
    val df = Seq("1.5", "2", "nope", "", "  3.25  ", "1e3").toDF("s")
    val got = df.select(
      Normalize.saferDouble(col("s"), -1.0).as("d"),
      Normalize.saferLong(col("s"), -7L).as("l")).as[(Double, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1.5, 2.0, -1.0, -1.0, 3.25, 1000.0))
    assert(got.map(_._2).toSeq === Seq(-7L, 2L, -7L, -7L, -7L, -7L))
  }
}
