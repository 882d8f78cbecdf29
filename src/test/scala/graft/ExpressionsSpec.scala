package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.plans.GraftFunctions

/** Native Catalyst expressions equal the pinned Analyzer, both in codegen
  * and interpreted (nullSafeEval) paths, and register as SQL functions. */
class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Seq("Wi-Fi routers", "O'Brien's dog", "", "the the a",
    "anti-TNF   therapy", "ENSG00000139618 gene")

  test("graft_term_freqs equals Analyzer.termFreqs (codegen path)") {
    val got = texts.toDF("t")
      .select(col("t"), GraftFunctions.term_freqs(col("t")).as("m"))
      .as[(String, Map[String, Int])].collect().toMap
    texts.foreach(t => assert(got(t) === Analyzer.termFreqs(t), s"text: $t"))
  }

  test("graft_tokenize equals Analyzer.tokenize, order preserved") {
    val got = texts.toDF("t")
      .select(col("t"), GraftFunctions.tokenize(col("t")).as("a"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach(t => assert(got(t) === Analyzer.tokenize(t).toSeq, s"text: $t"))
  }

  test("graft_segment_of equals Hashing.segmentOf (codegen; incl. non-ASCII)") {
    val urls = Seq("doc://00000001", "https://a.example/x?q=1", "",
      "héllo wörld", "日本語のページ", "emoji 🚀 url", "😀plane1")
    Seq(1, 7, 32, 256).foreach { p =>
      val got = urls.toDF("u")
        .select(col("u"), GraftFunctions.segment_of(col("u"), p).as("s"))
        .as[(String, Int)].collect().toMap
      urls.foreach { u =>
        assert(got(u) === graft.index.Hashing.segmentOf(u, p), s"url: $u, P=$p")
        assert(got(u) >= 0 && got(u) < p)
      }
    }
  }

  test("null input yields null (nullIntolerant)") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(GraftFunctions.tokenize(col("t"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(graft_tokenize('Wi-Fi routers')) AS n").head().getInt(0)
    assert(n === 4)
    val m = spark.sql(
      "SELECT graft_term_freqs('a a b')['a'] AS c").head().getInt(0)
    assert(m === 2)
  }

  test("expression runs inside whole-stage codegen projections") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(size(GraftFunctions.tokenize(col("text"))).as("n"),
        GraftFunctions.term_freqs(col("text")).as("m"))
      .filter(col("n") > 0)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(plan.contains("graft_tokenize"), "expression missing from plan")
    // explode(graft_tokenize(...)) also works (Generate sits outside WSCG
    // by Spark's own planning, not because the expression is interpreted)
    val exploded = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(GraftFunctions.tokenize(col("text"))).as("tok"))
      .groupBy("tok").count()
    assert(exploded.count() > 0)
  }
}
