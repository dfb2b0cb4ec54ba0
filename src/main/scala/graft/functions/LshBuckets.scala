package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** All `nTables` sign-LSH bucket ids of a vector in ONE codegen'd pass —
  * the hot-loop replacement for composing `nTables × bits` separate
  * `when(graft_dot(v, planeₜᵢ) >= 0, 1<<i)` Column trees.
  *
  * Why this exists (measured, sf10): at b = 10 bits × L = 8 tables the
  * composed form is 80 DotProduct nodes + 80 `when` branches + an
  * 8-element array constructor in one projection — past the codegen
  * budget, so the stage falls back to interpreted expression
  * evaluation, and hashing the 200k-vector corpus cost ~80 s of
  * `ann_lsh_mp_search`'s 72 s warm wall (measured via LshMpProbe;
  * candidate volume was fine — 210k pairs, max bucket 1338). This
  * expression is a single tight triple loop over a flat plane matrix
  * referenced once via `addReferenceObj`: same work, ~1 s, and it
  * stays inside whole-stage codegen at any (L, b) the schedule can
  * produce.
  *
  * Bit-identical to the composed form by construction: plane (t, i) is
  * the flat slice [(t·b+i)·dim, +dim), the per-plane dot accumulates
  * dimension-ascending over min(|v|, dim) exactly like [[DotProduct]],
  * the sign test is `>= 0`, and bit i of table t's bucket is `1L << i`
  * — so the DuckDB oracle of the multi-probe family is unchanged.
  *
  * Children: (vector array<double>, flatPlanes array<double>, nTables
  * int, bits int); the last three are required foldable — they are the
  * index's compile-time configuration, not data.
  */
case class LshBuckets(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def vector = first
  private def flatPlanes = second

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vector.nullable
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType, IntegerType)
    val mismatch = children.map(_.dataType).zip(want).exists {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => false
      case (got, expected) => got != expected
    }
    if (mismatch)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_buckets expects (array<double>, array<double>, int, int), " +
          s"got ${children.map(_.dataType).mkString(", ")}")
    else if (!flatPlanes.foldable || !third.foldable || !fourth.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_lsh_buckets expects foldable planes/nTables/bits (index configuration)")
    else {
      val (tl, tb) = (evalInt(third), evalInt(fourth))
      val n = flatPlanes.eval().asInstanceOf[ArrayData].numElements()
      if (tl < 1 || tb < 1 || tb > 63)
        TypeCheckResult.TypeCheckFailure(s"need nTables >= 1 and 1 <= bits <= 63, got ($tl, $tb)")
      else if (n == 0 || n % (tl * tb) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"flat plane matrix length $n is not a positive multiple of nTables*bits = ${tl * tb}")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private def evalInt(e: Expression): Int = e.eval().asInstanceOf[Int]
  @transient private lazy val l: Int = evalInt(third)
  @transient private lazy val b: Int = evalInt(fourth)
  @transient private lazy val flat: Array[Double] =
    flatPlanes.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dim: Int = flat.length / (l * b)

  override protected def nullSafeEval(v: Any, p: Any, nt: Any, bt: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    val n = math.min(vd.numElements(), dim)
    val out = new Array[Long](l)
    var t = 0
    while (t < l) {
      var bucket = 0L
      var i = 0
      while (i < b) {
        var s = 0.0
        val off = (t * b + i) * dim
        var d = 0
        while (d < n) { s += vd.getDouble(d) * flat(off + d); d += 1 }
        if (s >= 0.0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$l];
         |for (int $t = 0; $t < $l; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $b; $i++) {
         |    double $s = 0.0;
         |    int $off = ($t * $b + $i) * $dim;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $v.getDouble($d) * $flatRef[$off + $d];
         |    }
         |    if ($s >= 0.0) $bucket |= (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): LshBuckets =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
