package graft

/** Driver-contract smoke: entry() yields rows; every query runs at
  * sf0.001; every oracleSql key exists in queries. */
class EntrySpec extends SparkSuite {

  test("entry returns BM25 hits") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("rank", "docId", "url", "score"))
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qs)
    assert(extra.isEmpty, s"oracle without query: $extra")
    // the current contract is stronger: EVERY query is independently
    // oracled (no rows-only checks left) — keep it that way
    val unoracled = qs.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty, s"query without oracle: $unoracled")
  }

  test("every query runs on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, name)
    }
  }
}
