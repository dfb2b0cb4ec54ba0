package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Exponentially-weighted moving average — the pandas
  * `Series.ewm(span=p, adjust=True).mean()` semantics the reference's
  * entire EMA family is built on (`feature_engineer.py:105-161`,
  * `:189-204`: EMA-n, MACD, RSI smoothing, ATR smoothing).
  *
  *   ewm_t = Σ_{i≤t} (1−α)^(t−i) x_i / Σ_{i≤t} (1−α)^(t−i)
  *
  * Implemented as a Catalyst [[DeclarativeAggregate]] — pure expressions,
  * so it stays inside whole-stage codegen (no UDF boundary, no object
  * allocation per row). The O(1)-per-row recurrence is
  *
  *   num_t = (1−α)·num_{t−1} + x_t ;  den_t = (1−α)·den_{t−1} + 1
  *
  * which, unlike the direct weighted sum (`pow(1/(1−α), rn)` tricks),
  * never overflows on long series — the 100 TB-safe form.
  *
  * Null handling: null inputs are skipped without decaying the buffer
  * (pandas `ignore_na=True`; identical to `ignore_na=False` for the
  * leading-null series produced by diff/lag warmups, which is the only
  * null shape in this engine).
  *
  * Intended for ordered window frames (`UNBOUNDED PRECEDING..CURRENT
  * ROW`), where Spark's window AggregateProcessor applies updates in row
  * order. `mergeExpressions` implements ordered concatenation (right
  * segment follows left), which is correct for frame-segment merges but
  * NOT for unordered groupBy partials — use it as a window function.
  *
  * @param child     input series (double)
  * @param alphaExpr foldable smoothing factor α ∈ (0, 1]; span s ⇒ α = 2/(s+1)
  */
case class EwmAvg(child: Expression, alphaExpr: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = alphaExpr

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_avg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"ewm_avg input must be DOUBLE, got ${child.dataType.sql}")
    else if (alphaExpr.dataType != DoubleType || !alphaExpr.foldable)
      TypeCheckResult.TypeCheckFailure("ewm_avg alpha must be a foldable DOUBLE literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val num = AttributeReference("ewm_num", DoubleType, nullable = false)()
  private lazy val den = AttributeReference("ewm_den", DoubleType, nullable = false)()
  private lazy val cnt = AttributeReference("ewm_cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(num, den, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0L))

  private def decay: Expression = Subtract(Literal(1.0), alphaExpr)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), num, Add(Multiply(num, decay), child)),
    If(IsNull(child), den, Add(Multiply(den, decay), Literal(1.0))),
    If(IsNull(child), cnt, Add(cnt, Literal(1L))))

  /** Ordered merge: right buffer's rows follow left's, so the left sums
    * decay by (1−α)^cnt_right before adding the right sums. */
  override lazy val mergeExpressions: Seq[Expression] = {
    val decayRight = Pow(decay, Cast(cnt.right, DoubleType))
    Seq(
      Add(Multiply(num.left, decayRight), num.right),
      Add(Multiply(den.left, decayRight), den.right),
      Add(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType), Divide(num, den))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EwmAvg =
    copy(child = newLeft, alphaExpr = newRight)
}
