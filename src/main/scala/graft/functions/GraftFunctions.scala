package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.DoubleType

/** Registration + typed column helpers for graft's custom Catalyst
  * functions (SURVEY §2.12). Registered per-session (idempotent); also
  * injectable at session build time via [[graft.plans.GraftExtensions]].
  */
object GraftFunctions {

  /** Register custom functions in the session's FunctionRegistry so they
    * are usable from both the Column API (`call_function`) and SQL text. */
  /** Builder shared with [[graft.plans.GraftExtensions]]: casts inputs so
    * SQL-text literals (parsed as DECIMAL) and integer columns work. */
  def ewmAvgBuilder(exprs: Seq[Expression]): EwmAvg =
    EwmAvg(Cast(exprs.head, DoubleType), Cast(exprs(1), DoubleType))

  def dotBuilder(exprs: Seq[Expression]): DotProduct =
    DotProduct(exprs.head, exprs(1))

  def intersectCountBuilder(exprs: Seq[Expression]): IntersectCount =
    IntersectCount(exprs.head, exprs(1))

  def chunkTokensBuilder(exprs: Seq[Expression]): ChunkTokens =
    ChunkTokens(exprs.head, exprs(1), exprs(2))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ewm_avg", ewmAvgBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_count", intersectCountBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_chunk_tokens", chunkTokensBuilder, "built-in")
  }

  /** Codegen'd dense dot product ([[DotProduct]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Codegen'd sorted-merge intersection count ([[IntersectCount]]):
    * both arrays must be sorted ascending and distinct. */
  def intersectCount(a: Column, b: Column): Column =
    call_function("graft_intersect_count", a, b)

  /** pandas `ewm(alpha=α, adjust=True).mean()` as a window aggregate. */
  def ewmAvg(c: Column, alpha: Double): Column =
    call_function("ewm_avg", c, lit(alpha))

  /** pandas `ewm(span=s, adjust=True).mean()`: α = 2/(s+1). */
  def ewmAvgSpan(c: Column, span: Int): Column =
    ewmAvg(c, 2.0 / (span + 1))
}
