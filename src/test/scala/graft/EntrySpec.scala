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

  test("every query runs on sf0.001; structurally-nonempty ones return rows") {
    val dir = "/root/testdata/sf0.001"
    // queries whose result CANNOT legitimately be empty at any SF (per-row
    // transforms of base tables, or top-k over a guaranteed-hit query) —
    // a silent all-rows-filtered regression must fail, not count()==0.
    // (q05 anti-join and similar are legitimately empty/small at tiny SF.)
    val nonEmpty = Set("q01_pricing_summary", "q10_dedup_exact",
      "q12_fingerprint", "q13_quality", "q14_langid", "q19_token_regex_stats",
      "q20_unpivot_part", "q21_bm25_topk", "q23_rollup_qty", "q25_pivot_events",
      "q27_score_transform", "q36_nfkd_cast", "q38_datasource_score",
      "q56_doc_suggest", "q57_scan_midsize")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (nonEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
