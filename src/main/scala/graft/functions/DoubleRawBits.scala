package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `doubleToRawLongBits` as a codegen'd Catalyst expression.
  *
  * For NON-NEGATIVE doubles the IEEE-754 bit pattern read as a signed
  * long is strictly order-preserving (`a < b  ⇔  rawBits(a) < rawBits(b)`
  * and `a == b ⇔ rawBits(a) == rawBits(b)` — sign bit 0, exponent then
  * mantissa in descending significance), which makes a (distance, id)
  * pair packable into ONE atomic value:
  * `rawBits(dist)·2³² + id` as DECIMAL(38,0) — see
  * [[GraftFunctions.packOrdId]]. `min` over that packed decimal is the
  * exact lexicographic argmin `ORDER BY dist, id LIMIT 1` per group, but
  * with a HASH-aggregable buffer: Spark plans `min(struct(dist, id))` as
  * a SortAggregate (struct buffers aren't UnsafeRow-mutable), which
  * sorts the full candidate×centroid input — measured 5.3 GB of sort
  * spill for `ann_ivf_search` at sf10 (205 M skinny rows) in the
  * shuffle-byte audit. The packed form keeps the whole argmin in
  * HashAggregate + whole-stage codegen: map-side combine, no sort, no
  * spill.
  *
  * Caller contract (enforced where used, not here): the ordering value
  * is non-negative and non-NaN — true by construction for squared L2
  * distances of finite inputs (each term `(a-b)²` is `+0.0` or
  * positive, and a sum of non-negatives can never be `-0.0`).
  */
case class DoubleRawBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_double_raw_bits expects a double input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_raw_bits"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleRawBits =
    copy(child = newChild)
}
