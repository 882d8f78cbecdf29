package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Varint

/** Property-style tests (seeded): encode∘decode = id, ordering preserved
  * (SURVEY.md §5 item 1). */
class VarintSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  test("known vectors round-trip") {
    val vs = Seq(0L, 1L, 7L, 127L, 128L, 130L, 16384L, Long.MaxValue)
    assert(Varint.decodeLongs(Varint.encodeLongs(vs)).toSeq === vs)
  }

  test("random longs round-trip (1000 cases)") {
    (1 to 1000).foreach { _ =>
      val vs = List.fill(rng.nextInt(50))(rng.nextLong().abs)
      assert(Varint.decodeLongs(Varint.encodeLongs(vs)).toSeq === vs)
    }
  }

  test("delta codec round-trips ascending sequences") {
    (1 to 500).foreach { _ =>
      val base = rng.nextLong(1L << 40)
      val asc = List.fill(rng.nextInt(200))(1L + rng.nextLong(1L << 41))
        .distinct.sorted.map(_ + base)
      val bytes = Varint.encodeDeltas(asc, base)
      assert(Varint.decodeDeltas(bytes, base).toSeq === asc)
    }
  }

  test("delta codec rejects non-ascending input") {
    intercept[IllegalArgumentException] {
      Varint.encodeDeltas(Seq(5L, 5L), 0L)
    }
  }

  test("strings round-trip including unicode and empties") {
    val vs = List("", "a", "héllo wörld", "доброе", "中文", "x" * 1000)
    assert(Varint.decodeStrings(Varint.encodeStrings(vs)).toSeq === vs)
    (1 to 200).foreach { _ =>
      val rs = List.fill(rng.nextInt(20))(rng.nextString(rng.nextInt(30)))
      assert(Varint.decodeStrings(Varint.encodeStrings(rs)).toSeq === rs)
    }
  }

  test("firstLastStrings agrees with a full decode") {
    assert(Varint.firstLastStrings(Array.empty[Byte]) === None)
    assert(Varint.firstLastStrings(Varint.encodeStrings(List("only")))
      === Some(("only", "only")))
    (1 to 100).foreach { _ =>
      val rs = List.fill(1 + rng.nextInt(20))(rng.nextString(rng.nextInt(30)))
      val blob = Varint.encodeStrings(rs)
      val full = Varint.decodeStrings(blob)
      assert(Varint.firstLastStrings(blob) === Some((full.head, full.last)))
    }
  }

  test("small values use single bytes") {
    assert(Varint.encodeLongs(Seq(0L, 127L)).length === 2)
    assert(Varint.encodeLongs(Seq(128L)).length === 2)
  }
}
