package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Routing

/** Dual-route valid/invalid sink (reference S12 semantics). */
class RoutingSpec extends SparkSuite {

  test("one input, two sinks, explanations preserved, nothing lost") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val total = events.count()
    val base = Files.createTempDirectory("graft-route").toString
    val rules = Seq(
      "unknown_type" -> !col("event_type").isin("click", "view", "purchase"),
      "value_out_of_range" -> (col("value") > 300.0))
    val (nValid, nInvalid) = Routing.routeValidInvalid(
      spark, events, rules, s"$base/valid", s"$base/invalid")
    assert(nValid + nInvalid === total)
    assert(nInvalid > 0 && nValid > 0)
    val invalid = spark.read.parquet(s"$base/invalid")
    // first-failing-rule semantics: unknown types never carry the range reason
    assert(invalid.filter(col("explanation") === "unknown_type" &&
      col("event_type").isin("click", "view", "purchase")).count() === 0)
    assert(invalid.filter(col("explanation") === "value_out_of_range")
      .filter(!col("event_type").isin("click", "view", "purchase")).count() === 0)
    // valid branch has no explanation column
    assert(!spark.read.parquet(s"$base/valid").columns.contains("explanation"))
  }
}
