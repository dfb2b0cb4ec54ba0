package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst GENERATOR (the UDTF tier of SURVEY §2.12 — scalar
  * [[DotProduct]], aggregate [[EwmAvg]], and this complete the
  * extension-class triple): strided context-window chunking of a token
  * array, one output row per chunk — `graft_chunk_tokens(toks, size,
  * stride)` emits (chunk_idx, start_tok, chunk_toks).
  *
  * Why a Generator and not `sequence`+`explode`+`slice`: the composed
  * form materializes the FULL token array into every exploded row and
  * slices afterwards — each output row carries an O(doc) payload until
  * the projection prunes it. A Generator slices while it emits, so a
  * 10k-token document costs O(chunk) per row, not O(doc); same plan
  * shape (Generate node, still zero exchanges), ~chunk/doc× less data
  * movement through the generate. Analyzer integration is free:
  * `ExtractGenerator` lifts the call into a `Generate` node exactly as
  * it does for `explode`.
  *
  * `CodegenFallback` is deliberate: GenerateExec only codegens the
  * built-in collection generators; a custom Generator runs interpreted
  * inside the codegen'd stage, which is the supported extension path.
  * Size/stride must be foldable (they parameterize the operator, they
  * are not per-row data). Empty/null arrays emit no rows — the
  * zero-token guard lives in the expression, not the query. */
case class ChunkTokens(child: Expression, sizeExpr: Expression,
                       strideExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, sizeExpr, strideExpr)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if sizeExpr.foldable && strideExpr.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_chunk_tokens expects (array<string>, foldable int size, foldable int stride)")
  }

  private lazy val size = sizeExpr.eval().asInstanceOf[Number].intValue()
  private lazy val stride = strideExpr.eval().asInstanceOf[Number].intValue()

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("chunk_toks", ArrayType(StringType), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) Iterator.empty
    else {
      val n = arr.numElements()
      val nChunks = math.ceil(math.max(n - size, 0) / stride.toDouble).toLong + 1
      (0L until nChunks).iterator.map { i =>
        val start = (i * stride).toInt
        val len = math.min(size, n - start)
        val slice = new GenericArrayData(
          Array.tabulate[Any](len)(j => arr.getUTF8String(start + j)))
        InternalRow(i, start.toLong, slice)
      }
    }
  }

  override def prettyName: String = "graft_chunk_tokens"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), sizeExpr = newChildren(1),
      strideExpr = newChildren(2))
}
