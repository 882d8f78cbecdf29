package graft

import java.nio.file.Files

import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.search.IndexHandle

/** Pins the Iceberg-style snapshot-isolation claim: an IndexHandle is
  * pinned to the snapshot that was LATEST at construction, so commits
  * landing afterwards (recrawl upserts, deletes) do not change what that
  * reader sees — until `vacuum` reclaims the old snapshot's dirs, exactly
  * like Iceberg's expire-snapshots. */
class SnapshotIsolationSpec extends SparkSuite {
  import spark.implicits._

  test("a pinned reader is unaffected by later upserts; a fresh one sees them") {
    val dir = Files.createTempDirectory("graft-iso").toString
    val docs = Seq(
      ("doc://0", "alpha beta gamma"),
      ("doc://1", "alpha delta"),
      ("doc://2", "beta gamma"))
    IndexBuilder.build(spark, docs.toDF("url", "text"), dir,
      IndexConfig(numSegments = 2, blockSize = 4))

    val pinned = new IndexHandle(spark, dir, warm = true)
    val before = pinned.topK("alpha", 10)
    assert(before.map(_.url).toSet === Set("doc://0", "doc://1"))

    // recrawl: doc://0 loses "alpha", doc://3 appears with it
    IndexBuilder.upsert(spark,
      Seq(("doc://0", "beta only now"), ("doc://3", "alpha fresh"))
        .toDF("url", "text"), dir)

    // the pinned reader still answers from its snapshot, bit-identically
    val after = pinned.topK("alpha", 10)
    assert(after.map(h => (h.docId, h.url, h.score)).toSeq ===
      before.map(h => (h.docId, h.url, h.score)).toSeq)

    // a fresh handle (new LATEST) sees the recrawled world
    val fresh = new IndexHandle(spark, dir, warm = true)
    assert(fresh.topK("alpha", 10).map(_.url).toSet ===
      Set("doc://1", "doc://3"))

    // time travel: a handle pinned explicitly to the old snapshot id
    // equals the implicitly pinned reader
    val old = Snapshot.list(dir).minBy(_.id)
    val tt = new IndexHandle(spark, dir, warm = false,
      snapshotId = Some(old.id))
    assert(tt.topK("alpha", 10).map(h => (h.docId, h.score)).toSeq ===
      before.map(h => (h.docId, h.score)).toSeq)
  }
}
