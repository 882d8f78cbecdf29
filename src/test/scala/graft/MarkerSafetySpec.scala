package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.index.{Deletes, IndexBuilder, IndexConfig, Snapshot}
import graft.search.{OracleSearch, Searcher}

/** Hostile-input hardening of the index's in-band marker scheme:
  * word_delimiter's preserve_original keeps raw lowercased tokens, so
  * crawl text with control bytes can emit tokens that would sort at or
  * below the TermLens/TermUrls/TermDels markers. IndexBuilder.safeTerm
  * escapes them at the index boundary; these specs pin that the whole
  * lifecycle (build, termdict, query, delete, purge) stays exact in their
  * presence, and that snapshot commits are CAS-protected. */
class MarkerSafetySpec extends SparkSuite {
  import spark.implicits._

  private val evil1 = "\u0001evil" // sorts between TermUrls and TermDels raw
  private val evil3 = "\u0003keep" // collides with the escape prefix itself

  test("control-char tokens: build, termdict, query and purge stay exact") {
    val dir = Files.createTempDirectory("graft-marker").toString
    val docs = Seq(
      ("doc://0", s"alpha $evil1 beta"),
      ("doc://1", s"alpha $evil3 gamma"),
      ("doc://2", "alpha beta gamma"))
    val cfg = IndexConfig(numSegments = 2, blockSize = 4)
    IndexBuilder.build(spark, docs.toDF("url", "text"), dir, cfg)

    // every stored term sorts strictly above the tombstone marker
    val snap = Snapshot.latest(dir).get
    val bad = spark.read.parquet(s"$dir/${snap.termdictDir.get}")
      .filter(col("term") <= IndexBuilder.TermDels).count()
    assert(bad === 0L)

    // the control-char tokens are findable, rank+score-identical to the
    // oracle (which analyzes raw text and never sees the escape)
    for (q <- Seq(evil1, evil3, s"alpha $evil1")) {
      val engine = Searcher.topK(spark, dir, q, 10)
      val oracle = OracleSearch.topK(docs, q, 10, cfg.numSegments)
      assert(engine.map(h => (h.docId, h.score)).toSeq ===
        oracle.map(h => (h.docId, h.score)).toSeq, s"query: $q")
    }
    assert(Searcher.topK(spark, dir, evil1, 10).map(_.url).toSeq === Seq("doc://0"))
    assert(Searcher.topK(spark, dir, evil3, 10).map(_.url).toSeq === Seq("doc://1"))

    // delete + purge with control-char terms in the sorted stream: the
    // tombstone walk and live-doc accounting stay correct (pre-fix this
    // passed tombstones through unchanged while reporting success)
    Deletes.delete(spark, dir, Seq("doc://0"))
    Deletes.purge(spark, dir)
    assert(Searcher.topK(spark, dir, evil1, 10).isEmpty)
    assert(Searcher.topK(spark, dir, "beta", 10).map(_.url).toSeq === Seq("doc://2"))
    assert(Snapshot.latest(dir).get.numDocs === 2L)
  }

  test("concurrent commit: a committer from a stale parent fails loudly") {
    val dir = Files.createTempDirectory("graft-cas").toString
    IndexBuilder.build(spark,
      Seq(("doc://0", "alpha beta")).toDF("url", "text"), dir,
      IndexConfig(numSegments = 1, blockSize = 4))
    val snap = Snapshot.latest(dir).get

    val winner = snap.copy(id = snap.id + 1, parent = snap.id)
    Snapshot.commit(dir, winner)
    // a second committer that also built on `snap` must NOT silently
    // replace the winner (lost tombstones / vanished generations)
    val loser = snap.copy(id = snap.id + 1, parent = snap.id)
    val e = intercept[IllegalStateException](Snapshot.commit(dir, loser))
    assert(e.getMessage.contains("concurrent commit"))
    assert(Snapshot.latest(dir).get.id === winner.id)
  }
}
