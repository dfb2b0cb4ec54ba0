package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dense dot product over two double-array columns — the
  * tier-(b) extension path from the build brief: a native Catalyst
  * `Expression` with `doGenCode`, not a Scala UDF (which would box every
  * element and break whole-stage codegen) and not an unrolled 64-term
  * Column expression (which exceeds the codegen expression budget in
  * join conditions and falls back to interpretation — the measured
  * ~1 µs/term/row cliff).
  *
  * The generated code is a tight primitive loop over the columnar
  * `ArrayData` — no boxing, no Row materialization — and participates in
  * whole-stage codegen like any builtin. Summation runs
  * dimension-ascending, matching both the unrolled form and DuckDB's
  * `list_sum` fold, so results are bit-identical to the existing oracle.
  * Null arrays propagate null (BinaryExpression's null-safe contract);
  * mismatched lengths take the shorter prefix (never thrown at scale —
  * schema-enforced upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> inputs, got $l and $r")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
