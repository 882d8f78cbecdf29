package graft

import java.nio.file.Files

import graft.index.{IndexBuilder, IndexConfig, PostingRow, Varint}
import graft.search.{Bm25, OracleSearch, PostingIterator, Searcher}

/** Differential fuzzing of the WAND/posting-codec core: random corpora with
  * tiny blocks (block skipping fires constantly) must stay rank- and
  * score-identical to the exhaustive oracle; posting cursors must agree
  * with a full decode under random seek patterns. Seeded — failures are
  * reproducible. */
class WandFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("random corpora x random queries: engine == oracle (blockSize 4)") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "the", "of",
      "w1x", "w2x", "w3x", "rare1", "rare2")
    (1 to 6).foreach { round =>
      val nDocs = 30 + rng.nextInt(120)
      val docs = (0 until nDocs).map { i =>
        val len = 1 + rng.nextInt(30)
        val text = Seq.fill(len)(vocab(
          math.min(rng.nextInt(vocab.length), rng.nextInt(vocab.length)))) // skew
          .mkString(" ")
        (f"https://fuzz$round%02d.org/p/$i%04d", text)
      }
      val cfg = IndexConfig(numSegments = 4, blockSize = 4)
      val dir = Files.createTempDirectory(s"graft-fuzz-$round").toString
      IndexBuilder.build(spark, docs.toDF("url", "text"), dir, cfg)
      (1 to 8).foreach { _ =>
        val qTerms = Seq.fill(1 + rng.nextInt(4))(vocab(rng.nextInt(vocab.length)))
        val q = qTerms.mkString(" ")
        val k = 1 + rng.nextInt(15)
        val engine = Searcher.topK(spark, dir, q, k)
        val oracle = OracleSearch.topK(docs, q, k, cfg.numSegments)
        assert(engine.map(h => (h.docId, h.score)).toSeq ===
          oracle.map(h => (h.docId, h.score)).toSeq,
          s"round=$round q='$q' k=$k")
      }
    }
  }

  test("posting cursor: random seeks agree with full decode") {
    (1 to 50).foreach { it =>
      val n = 1 + rng.nextInt(300)
      val segBase = IndexBuilder.segBase(3)
      val docIds = {
        var cur = segBase
        Array.fill(n) { cur += 1 + rng.nextInt(20); cur }
      }
      val tfs = Array.fill(n)(1 + rng.nextInt(9))
      val lens = Array.fill(n)(5 + rng.nextInt(50))
      val blockSize = 1 + rng.nextInt(8)
      // encode via the real builder encoder
      val rows = IndexBuilder.TokRowsForTest(3, "t", docIds, tfs, lens)
      val encoded = IndexBuilder.encodeForTest(rows, blockSize)
      assert(encoded.df === n)
      assert(Varint.decodeDeltas(encoded.docBytes, segBase).toSeq === docIds.toSeq)

      // random monotone seek pattern vs linear reference
      val cursor = new PostingIterator(encoded, 1.0, blockSize, 25.0)
      cursor.start()
      var target = segBase
      while (target < docIds.last + 5) {
        target += 1 + rng.nextInt(30)
        cursor.seek(target)
        val expectedIdx = docIds.indexWhere(_ >= target)
        if (expectedIdx < 0) assert(cursor.exhausted, s"it=$it target=$target")
        else {
          assert(cursor.curDoc === docIds(expectedIdx), s"it=$it target=$target")
          assert(cursor.curTf === tfs(expectedIdx), s"it=$it target=$target")
        }
      }
    }
  }
}
