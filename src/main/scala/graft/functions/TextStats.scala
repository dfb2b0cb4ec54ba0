package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The five integer text statistics behind the quality-score kernel in
  * ONE codegen'd pass over the bytes (r16, guide §4 — the LshBuckets /
  * HadamardRotate precedent):
  *
  *   len      = length(text)                        (code points)
  *   n_tok    = size(filter(split(lower(text), "[^a-z0-9]+"), _ != ""))
  *   n_stop   = size(filter(tokens, _ in STOP))
  *   n_punct  = length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))
  *              (= code points INSIDE the ASCII punct ranges — the kept
  *               side of the strippedLen idiom)
  *   n_digit  = length(regexp_replace(text, "[^0-9]", ""))
  *
  * Why this exists (measured, sf0.1): [[graft.scale.TextAnalysis
  * .qualityScoreCol]] evaluated two `regexp_replace` passes (each
  * BUILDING the replaced string just to take its length), one regex
  * split into a token array, and an interpreted higher-order `filter`
  * (HOFs are CodegenFallback) — per document, per consumer, and the
  * fit-then-apply quality queries evaluate the score on TWO plan
  * branches. quality_calibrate / text_quality_adaptive each carried two
  * ~0.45 s single-task stages of exactly this (PhaseProbe receipts);
  * r15's A/B showed forced WIDTH on these kernels regresses — the §1.2
  * step-2 fix is to make the per-row work cheap instead.
  *
  * Identity argument (the counts are INTEGERS, so downstream score
  * doubles are bit-identical when the counts match):
  *   - len: UTF8String.numChars ≡ length().
  *   - tokens: the split pattern classes every code point OUTSIDE
  *     [a-z0-9] as separator; [a-z0-9] are single UTF-16 units, so
  *     maximal [a-z0-9] runs over the LOWERCASED string (the same
  *     UTF8String.toLowerCase the Lower expression applies) are exactly
  *     the split's non-empty tokens — leading/trailing/repeated
  *     separators produce only empty strings, which the filter drops.
  *   - stop set: runs are pure ASCII; direct char compare.
  *   - punct/digit: the negated classes match per code point, so the
  *     kept length is the count of code points inside the ranges
  *     (!-/, :-@, [-`, {-~) resp. [0-9]; supplementary code points are
  *     outside both and count 0 either way.
  * TextStatsSpec pins equality against the regex/HOF forms on the real
  * corpus and on adversarial fixtures (unicode, empties, punct-only).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_text_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats expects string, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextStats.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false)))

  private val Stop: Array[String] =
    Array("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  private def isPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  /** Shared by interpreted eval and generated code. */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    // len / punct / digit over the ORIGINAL text, per code point
    var len = 0
    var nPunct = 0
    var nDigit = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      len += 1
      if (cp >= '0' && cp <= '9') nDigit += 1
      else if (isPunct(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    // tokens over the LOWERCASED text — the exact Lower-expression
    // semantics (UTF8String.toLowerCase), then maximal [a-z0-9] runs
    val low = u.toLowerCase.toString
    var nTok = 0
    var nStop = 0
    var j = 0
    while (j < low.length) {
      val c = low.charAt(j)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = j
        var k = j + 1
        while (k < low.length && {
          val d = low.charAt(k)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) k += 1
        nTok += 1
        val runLen = k - start
        if (runLen <= 4) {
          var t = 0
          while (t < Stop.length) {
            val w = Stop(t)
            if (w.length == runLen && low.regionMatches(start, w, 0, runLen)) {
              nStop += 1
              t = Stop.length
            } else t += 1
          }
        }
        j = k
      } else j += 1
    }
    new GenericInternalRow(Array[Any](len, nTok, nStop, nPunct, nDigit))
  }
}
