package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType, StringType}

/** Native Catalyst expressions for the analyzer chain — the tokenizer stays
  * inside whole-stage codegen instead of crossing the Scala-UDF row
  * conversion boundary (SURVEY.md §2.9 preference order: Expression with
  * doGenCode > UDF). Both delegate to the single pinned Analyzer
  * implementation so token streams remain byte-identical everywhere. */
case class TermFreqsExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "graft_term_freqs"
  override protected def nullSafeEval(input: Any): Any =
    graft.analysis.Analyzer.termFreqsCatalyst(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.Analyzer.termFreqsCatalyst($c)")
  override protected def withNewChildInternal(newChild: Expression): TermFreqsExpr =
    copy(child = newChild)
}

case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"
  override protected def nullSafeEval(input: Any): Any =
    graft.analysis.Analyzer.tokenizeCatalyst(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.Analyzer.tokenizeCatalyst($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

/** Deterministic segment assignment segId = floorMod(hash64(url), P) as a
  * codegen'd expression: the build's only remaining per-row Scala UDF cost
  * (UTF8String -> String copy + boxing across the UDF boundary) disappears
  * from the map side of the one build exchange. Delegates to the same
  * [[graft.index.Hashing]] FNV-1a so driver (oracle), executors, and every
  * historical index agree on doc placement. */
case class SegmentOfExpr(child: Expression, numSegments: Int)
    extends UnaryExpression {
  require(numSegments > 0, s"numSegments must be positive: $numSegments")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_segment_of"
  override protected def nullSafeEval(input: Any): Any =
    graft.index.Hashing.segmentOfUtf8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], numSegments)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.index.Hashing.segmentOfUtf8($c, $numSegments)")
  override protected def withNewChildInternal(newChild: Expression): SegmentOfExpr =
    copy(child = newChild)
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  private[plans] def unaryBuilder(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${exprs.length}")
    f(exprs.head)
  }
  def term_freqs(c: Column): Column =
    GraftColumnBridge.column(TermFreqsExpr(GraftColumnBridge.expression(c)))
  def tokenize(c: Column): Column =
    GraftColumnBridge.column(TokenizeExpr(GraftColumnBridge.expression(c)))
  def segment_of(c: Column, numSegments: Int): Column =
    GraftColumnBridge.column(
      SegmentOfExpr(GraftColumnBridge.expression(c), numSegments))

  /** Imperative registration for an existing session (tests, Demo). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_term_freqs", unaryBuilder("graft_term_freqs", TermFreqsExpr), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", unaryBuilder("graft_tokenize", TokenizeExpr), "scala_udf")
  }
}

/** SparkSessionExtensions entry point:
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` exposes the
  * analyzer chain as SQL functions in every session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_term_freqs"),
      new ExpressionInfo(classOf[TermFreqsExpr].getName, "graft_term_freqs"),
      GraftFunctions.unaryBuilder("graft_term_freqs", TermFreqsExpr)))
    e.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[TokenizeExpr].getName, "graft_tokenize"),
      GraftFunctions.unaryBuilder("graft_tokenize", TokenizeExpr)))
  }
}
