package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The fixed 64-dim Hadamard-with-signs OPQ rotation in ONE codegen'd
  * pass — the hot-loop replacement for the higher-order-function form
  *
  * {{{
  * transform(sequence(0, 63), i =>
  *   aggregate(zip_with(v, sequence(0, 63), (x, j) =>
  *     when((bit_count(i & j) + bit_count(j)) % 2 = 0, x).otherwise(-x)),
  *     0.0, (a, b) => a + b) / 8.0)
  * }}}
  *
  * Why this exists (r15 optimization round, measured at sf0.1): HOF
  * lambdas evaluate interpreted — per vector the form above runs 4096
  * lambda invocations and allocates 64 intermediate arrays, costing
  * `ann_opq_search` ~1.2 s over `ann_pq_search`'s identical ADC plan
  * (2.02 vs 0.83 warm) for 2 000 vectors of arithmetic that is ~4 µs
  * vectorized. Same fix as [[LshBuckets]] (the r12 composed-tree
  * fallout): one tight loop over a sign table referenced once via
  * `addReferenceObj`, inside whole-stage codegen.
  *
  * Bit-identical to the HOF by construction: out[i] accumulates
  * j-ascending from 0.0 exactly like `aggregate`'s left fold, the
  * sign is the same `(bitCount(i & j) + bitCount(j)) % 2 == 0` test,
  * `x * ±1.0` is IEEE-exact sign application (`x * -1.0 ≡ -x`,
  * `x * 1.0 ≡ x`), and the final `/ 8.0` is an exact exponent shift.
  * The DuckDB mirror ([[graft.scale.Similarity.opqRotCte]]) is
  * unchanged — the oracle pins the equivalence.
  *
  * Null contract: null array → null; any null element or arity < 64 →
  * an all-null 64-element array, mirroring the HOF (zip_with pads the
  * SHORT side with nulls, which propagate through the fold and null
  * every output). For arity > 64 the two forms DIVERGE by design
  * (r16, the r15 advice item): zip_with then pads the SEQUENCE side,
  * the null `when` condition falls through to `otherwise(-x)`, and
  * the fold returns non-null sums that include the extra negated
  * terms — a 64-dim rotation applied to a longer vector is
  * meaningless, so this expression returns the all-null array there
  * too (fail-closed) rather than reproducing the HOF's accidental
  * arithmetic. Engine embeddings are fixed 64-dim, so no registered
  * query can observe the divergence; `HadamardRotateSpec` pins both
  * sides of the contract. */
case class HadamardRotate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hd_rotate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hd_rotate expects array<double>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    HadamardRotate.rotate(vd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HadamardRotate.rotate($v);")

  override protected def withNewChildInternal(newChild: Expression): HadamardRotate =
    copy(child = newChild)
}

object HadamardRotate {
  private val D = 64
  /** signs(i*64 + j) = ±1.0 — the Hadamard-with-signs matrix entries
    * (before the 1/8 scale), precomputed once per JVM. */
  private val signs: Array[Double] = {
    val s = new Array[Double](D * D)
    var i = 0
    while (i < D) {
      var j = 0
      while (j < D) {
        s(i * D + j) =
          if ((Integer.bitCount(i & j) + Integer.bitCount(j)) % 2 == 0) 1.0 else -1.0
        j += 1
      }
      i += 1
    }
    s
  }

  private val allNull: GenericArrayData =
    new GenericArrayData(new Array[Any](D))

  /** Shared by interpreted eval and generated code (the codegen emits a
    * single static call — the loop body is identical either way). */
  def rotate(vd: ArrayData): ArrayData = {
    if (vd.numElements() != D) return allNull
    val in = new Array[Double](D)
    var j = 0
    while (j < D) {
      if (vd.isNullAt(j)) return allNull
      in(j) = vd.getDouble(j)
      j += 1
    }
    val out = new Array[Any](D)
    var i = 0
    while (i < D) {
      var acc = 0.0
      val off = i * D
      var k = 0
      while (k < D) { acc += in(k) * signs(off + k); k += 1 }
      out(i) = acc / 8.0
      i += 1
    }
    new GenericArrayData(out)
  }
}
