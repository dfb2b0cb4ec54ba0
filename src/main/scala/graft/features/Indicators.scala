package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Composable technical-indicator column builders — SURVEY §2.7.
  *
  * Everything here is a pure `Column` expression over
  * `Window.partitionBy(key).orderBy(time)`, so indicators compose into a
  * single `select` and stay inside whole-stage codegen. One shuffle per
  * distinct partitioning (Catalyst reuses the sort across all window
  * specs with the same partition/order), so the entire 50-indicator
  * suite costs one exchange + one sort at any scale.
  *
  * Warmup semantics: pandas `rolling(n)` emits NaN for the first n−1
  * rows; Spark's framed aggs emit partial results. Every framed builder
  * is wrapped in [[framed]], which nulls rows whose frame isn't full —
  * without this, parity with the reference breaks on every indicator
  * (SURVEY §7.5).
  */
object Indicators {

  /** Base window: one time-series per key, ordered. */
  def W(key: String = "user_id", time: String = "bucket"): WindowSpec =
    Window.partitionBy(col(key)).orderBy(col(time))

  /** n-row trailing frame [-(n-1), 0]. */
  def Wn(w: WindowSpec, n: Int): WindowSpec = w.rowsBetween(-(n - 1), 0)

  /** Emit `agg` over the n-row frame only when the frame holds n non-null
    * inputs (pandas warmup-NaN parity). */
  def framed(c: Column, n: Int, w: WindowSpec)(agg: (Column, WindowSpec) => Column): Column =
    when(count(c).over(Wn(w, n)) === n, agg(c, Wn(w, n)))

  /** Division that yields NULL on a zero denominator. Spark doubles give
    * Infinity/NaN on /0 while DuckDB gives NULL; every oracle-checked
    * ratio goes through this (mirrored as `x / nullif(y, 0)` in SQL). */
  def safeDiv(a: Column, b: Column): Column = when(b =!= 0, a / b)

  /** W2 — diff / pct_change (`feature_engineer.py:121,225-226`). */
  def diff(c: Column, w: WindowSpec): Column = c - lag(c, 1).over(w)
  def pctChange(c: Column, w: WindowSpec): Column = {
    val prev = lag(c, 1).over(w); safeDiv(c - prev, prev)
  }

  /** W3 — SMA (`feature_engineer.py:95-103`). */
  def sma(c: Column, n: Int, w: WindowSpec): Column = framed(c, n, w)(avg(_).over(_))

  /** Rolling sample std (pandas ddof=1 default). */
  def rollStd(c: Column, n: Int, w: WindowSpec): Column = framed(c, n, w)(stddev(_).over(_))

  def rollMax(c: Column, n: Int, w: WindowSpec): Column = framed(c, n, w)(max(_).over(_))
  def rollMin(c: Column, n: Int, w: WindowSpec): Column = framed(c, n, w)(min(_).over(_))
  def rollSum(c: Column, n: Int, w: WindowSpec): Column = framed(c, n, w)(sum(_).over(_))

  /** W5 (simple variant) — RSI from rolling-mean gains/losses
    * (`backtesting_engine.py:213-221`). `d` must be the 1-lag diff of the
    * price; gains/losses inherit its leading null so the warmup guard
    * counts only full windows of real diffs. */
  def gains(d: Column): Column  = when(d.isNotNull, when(d > 0, d).otherwise(0.0))
  def losses(d: Column): Column = when(d.isNotNull, when(d < 0, -d).otherwise(0.0))
  def rsiSimple(d: Column, n: Int, w: WindowSpec): Column = {
    val g = sma(gains(d), n, w)
    val l = sma(losses(d), n, w)
    // pandas: rs = g/0 = inf => rsi 100; 0/0 => NaN => null here
    when(g.isNull || l.isNull, lit(null))
      .when(l === 0 && g === 0, lit(null))
      .when(l === 0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + g / l))
  }

  /** W7 — Bollinger bands (`feature_engineer.py:163-187`). */
  case class Bollinger(middle: Column, upper: Column, lower: Column, width: Column, pctB: Column)
  def bollinger(c: Column, n: Int, k: Double, w: WindowSpec): Bollinger = {
    val mid = sma(c, n, w); val sd = rollStd(c, n, w)
    val up = mid + lit(k) * sd; val lo = mid - lit(k) * sd
    Bollinger(mid, up, lo, safeDiv(up - lo, mid), safeDiv(c - lo, up - lo))
  }

  /** W8 — true range (`feature_engineer.py:189-204`): max(h−l, |h−pc|, |l−pc|).
    * Null on the first row (no prev close), matching pandas shift. */
  def trueRange(high: Column, low: Column, close: Column, w: WindowSpec): Column = {
    val pc = lag(close, 1).over(w)
    when(pc.isNotNull, greatest(high - low, abs(high - pc), abs(low - pc)))
  }

  /** W12 — momentum (`feature_engineer.py:252-256`). */
  def momentum(c: Column, n: Int, w: WindowSpec): Column = {
    val prev = lag(c, n).over(w); safeDiv(c, prev) - 1
  }

  /** W14 — Williams %R (`advanced_feature_engineer.py:81-87`). */
  def williamsR(high: Column, low: Column, close: Column, n: Int, w: WindowSpec): Column = {
    val hh = rollMax(high, n, w); val ll = rollMin(low, n, w)
    lit(-100.0) * safeDiv(hh - close, hh - ll)
  }

  /** W15 — Stochastic %K (`advanced_feature_engineer.py:89-98`); %D is
    * sma(%K, 3) applied by the caller after materializing %K. */
  def stochK(high: Column, low: Column, close: Column, n: Int, w: WindowSpec): Column = {
    val hh = rollMax(high, n, w); val ll = rollMin(low, n, w)
    safeDiv(close - ll, hh - ll) * 100.0
  }

  /** W22 — OBV volume proxy (`advanced_feature_engineer.py:235-252`):
    * running signed-range sum; running totals have no warmup. */
  def obvProxy(close: Column, high: Column, low: Column, w: WindowSpec): Column = {
    val d = diff(close, w)
    val signed = when(d > 0, high - low).when(d < 0, -(high - low)).otherwise(0.0)
    sum(signed).over(w.rowsBetween(Window.unboundedPreceding, 0))
  }

  /** W35 — running peak + drawdown (`backtesting_engine.py:107-129`). */
  def runningPeak(c: Column, w: WindowSpec): Column =
    max(c).over(w.rowsBetween(Window.unboundedPreceding, 0))
  def drawdown(c: Column, w: WindowSpec): Column = {
    val pk = runningPeak(c, w); safeDiv(pk - c, pk)
  }

  /** W24 — rolling interpolated quantile (pandas `rolling(n).quantile(q)`,
    * linear interpolation) via sorted collect_list over the frame. Fine
    * for n ≤ ~50 (SURVEY §7.4); frames beyond that should move to a
    * t-digest `TypedImperativeAggregate`. */
  def rollQuantile(c: Column, n: Int, q: Double, w: WindowSpec): Column = {
    val pos = q * (n - 1)                  // 0-based fractional index
    val loIdx = math.floor(pos).toInt + 1  // element_at is 1-based
    val frac = pos - math.floor(pos)
    val sorted = sort_array(collect_list(c).over(Wn(w, n)))
    when(count(c).over(Wn(w, n)) === n,
      element_at(sorted, loIdx) * (1 - frac) +
        (if (frac == 0.0) lit(0.0)
         else element_at(sorted, loIdx + 1) * frac))
  }

  /** W27 — rolling percent-rank of the current value among the trailing n
    * (pandas `rolling(n).rank(pct=True)` on the last element): peers ≤
    * current / n, via a HOF over the frame's collected values. */
  def rollPctRank(c: Column, n: Int, w: WindowSpec): Column = {
    val lst = collect_list(c).over(Wn(w, n))
    when(count(c).over(Wn(w, n)) === n,
      size(filter(lst, e => e <= c)) / lit(n.toDouble))
  }

  /** W25 — rolling Pearson correlation expanded from moment sums
    * (`corr(x,y).over(frame)` is not allowed in Spark): sample-covariance
    * form, identical expression on the oracle side. */
  def rollCorr(x: Column, y: Column, n: Int, w: WindowSpec): Column = {
    val f = Wn(w, n)
    val mxy = avg(x * y).over(f); val mx = avg(x).over(f); val my = avg(y).over(f)
    val sx = stddev(x).over(f); val sy = stddev(y).over(f)
    when(count(x * y).over(f) === n,
      safeDiv((mxy - mx * my) * lit(n.toDouble / (n - 1.0)), sx * sy))
  }

  /** Rolling sample skew/kurtosis from moment sums (pandas
    * `rolling.skew()/.kurt()` bias-corrected formulas). */
  def rollSkew(c: Column, n: Int, w: WindowSpec): Column = {
    require(n > 2)
    val f = Wn(w, n)
    val m1 = avg(c).over(f); val m2 = avg(c * c).over(f); val m3 = avg(c * c * c).over(f)
    val v = m2 - m1 * m1                          // population variance
    val mu3 = m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1
    val g1 = safeDiv(mu3, pow(v, 1.5))
    when(count(c).over(f) === n,
      g1 * math.sqrt(n.toDouble * (n - 1)) / (n - 2.0))
  }
  def rollKurt(c: Column, n: Int, w: WindowSpec): Column = {
    require(n > 3)
    val f = Wn(w, n)
    val m1 = avg(c).over(f); val m2 = avg(c * c).over(f)
    val m3 = avg(c * c * c).over(f); val m4 = avg(c * c * c * c).over(f)
    val v = m2 - m1 * m1
    val mu4 = m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 - lit(3.0) * m1 * m1 * m1 * m1
    val g2 = safeDiv(mu4, v * v) - lit(3.0)
    when(count(c).over(f) === n,
      ((g2 * (n + 1.0) + 6.0) * (n - 1.0)) / ((n - 2.0) * (n - 3.0)))
  }
}
