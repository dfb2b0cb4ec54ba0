package graft.operators

import graft.Tables
import graft.features.Indicators._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KAMA fold input: close plus the window-precomputed efficiency ratio
  * and smoothing constant (null through the 10-row warmup). */
case class KamaIn(user_id: Long, bucket: java.sql.Timestamp,
    close: Double, er: Option[Double], sc: Option[Double])

case class KamaRow(user_id: Long, bucket: java.sql.Timestamp,
    er: Double, kama: Double)

/** GARCH fold input: the simple return is a window lag computed BEFORE
  * the fold (null on each key's first row), so fold state is the
  * (prev return, variance) pair only. */
case class GarchIn(user_id: Long, bucket: java.sql.Timestamp,
    r: Option[Double])

case class GarchRow(user_id: Long, bucket: java.sql.Timestamp,
    ret: Double, cond_vol_bp: Double)

/** GARCH(1,1) state shared by the batch fold and the streaming channel
  * ([[graft.streaming.Channels.garchVolStream]]) — the zigzag/renko
  * shared-transition discipline: one definition, so batch and stream
  * cannot drift. */
final case class GarchCore(prevR: Double, s2: Double, seeded: Boolean)

/** Indicator pack 3 — third beyond-reference batch (the reference's own
  * suite stops at W43): Kaufman's Adaptive MA, Hull MA, Chande Momentum
  * and Elder Ray. Same execution contract as §2.7: window indicators
  * are pure `Column`s over the shared per-symbol ordered window (one
  * exchange + one sort per query, whole-stage codegen); KAMA's
  * state-dependent recurrence uses the [[graft.analysis.Stateful]]
  * `flatMapSortedGroups` fold — but only for the scalar recurrence:
  * its efficiency ratio and smoothing constant are plain window
  * aggregates computed BEFORE the fold, so the per-key fold state is
  * one double, not a price deque.
  */
object IndicatorPack3 {

  private val w = W()
  private def grow = w.rowsBetween(Window.unboundedPreceding, 0)

  // ---------------------------------------------------------------- W46
  /** W46 — KAMA(10, 2, 30).
    *
    * er = |close − close₋₁₀| / Σ₁₀|Δclose| (0 on a flat window);
    * sc = (er·(2/3 − 2/31) + 2/31)²; kama seeds to close on each key's
    * FIRST full-window row (rn = 11) and then folds
    * `kama += sc·(close − kama)`. Convention note: libraries disagree
    * on the seed (SMA vs first price); this engine pins seed = close
    * at rn = 11 and the oracle replays exactly that, all keys in
    * lockstep (depth = longest series, the PSAR oracle's shape). */
  def w46Kama(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ad = abs(col("close") - lag(col("close"), 1).over(w))
    val change = abs(col("close") - lag(col("close"), 10).over(w))
    val vol = rollSum(col("ad"), 10, w)
    val er = when(col("vol").isNotNull && col("change").isNotNull,
      when(col("vol") =!= 0, col("change") / col("vol")).otherwise(lit(0.0)))
    val t = col("er") * lit(2.0 / 3.0 - 2.0 / 31.0) + lit(2.0 / 31.0)
    val prepared = Tables.candles(spark, dir)
      .withColumn("ad", ad)
      .withColumn("change", change)
      .withColumn("vol", vol)
      .withColumn("er", er)
      .withColumn("sc", t * t)
      .select(col("user_id"), col("bucket"), col("close"),
        col("er").as("er"), col("sc").as("sc"))
      .as[KamaIn]
    val out = prepared
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[KamaIn]) =>
        var kama = 0.0
        var seeded = false
        rows.flatMap { r =>
          (r.er, r.sc) match {
            case (Some(e), Some(s)) =>
              if (!seeded) { kama = r.close; seeded = true }
              else kama = kama + s * (r.close - kama)
              Iterator.single(KamaRow(uid, r.bucket, e, kama))
            case _ => Iterator.empty
          }
        }
      }
    out.select(col("user_id"), col("bucket"),
      round(col("er"), 6).as("er_10"),
      round(col("kama"), 6).as("kama_10_2_30"))
  }

  private val recursiveCandles: String =
    "WITH RECURSIVE " + Tables.candlesSql.stripPrefix("WITH ")

  val w46Sql: String =
    s"""$recursiveCandles,
       |kb AS (
       |  SELECT user_id, bucket, close,
       |         row_number() OVER wk AS rn,
       |         abs(close - lag(close) OVER wk) AS ad,
       |         abs(close - lag(close, 10) OVER wk) AS change
       |  FROM candles
       |  WINDOW wk AS (PARTITION BY user_id ORDER BY bucket)),
       |ke AS (
       |  SELECT user_id, bucket, close, rn,
       |    CASE WHEN (CASE WHEN count(ad) OVER wk10 = 10 THEN sum(ad) OVER wk10 END)
       |              IS NOT NULL AND change IS NOT NULL THEN
       |      CASE WHEN (CASE WHEN count(ad) OVER wk10 = 10 THEN sum(ad) OVER wk10 END) <> 0
       |           THEN change / (CASE WHEN count(ad) OVER wk10 = 10 THEN sum(ad) OVER wk10 END)
       |           ELSE 0.0 END END AS er
       |  FROM kb
       |  WINDOW wkb AS (PARTITION BY user_id ORDER BY bucket),
       |         wk10 AS (wkb ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
       |ks AS (
       |  SELECT user_id, bucket, close, rn, er,
       |         (er * (2.0/3.0 - 2.0/31.0) + 2.0/31.0)
       |           * (er * (2.0/3.0 - 2.0/31.0) + 2.0/31.0) AS sc
       |  FROM ke),
       |kk(user_id, rn, bucket, er, kama) AS (
       |  SELECT user_id, rn, bucket, er, close FROM ks WHERE rn = 11
       |  UNION ALL
       |  SELECT b.user_id, b.rn, b.bucket, b.er,
       |         k.kama + b.sc * (b.close - k.kama)
       |  FROM ks b JOIN kk k ON b.user_id = k.user_id AND b.rn = k.rn + 1)
       |SELECT user_id, bucket,
       |       round(er, 6) + 0 AS er_10,
       |       round(kama, 6) + 0 AS kama_10_2_30
       |FROM kk""".stripMargin

  // ---------------------------------------------------------------- W47
  /** W47 — Hull MA(16): HMA = WMA(2·WMA(8) − WMA(16), 4).
    *
    * Each WMA is a lag-chain weighted sum (weights n..1, newest
    * heaviest) — null until the oldest lag exists, so warmup nulls
    * propagate through the arithmetic with no explicit gate. The outer
    * WMA runs over the derived series (window-over-window on the SAME
    * partition/order — Catalyst reuses one sort). The Spark terms and
    * the SQL text are generated from the same loop, so summation order
    * is identical by construction. */
  private def wmaTerms(n: Int): (Column => Column, String => String) = {
    val denom = n * (n + 1) / 2
    def colForm(c: Column): Column =
      (0 until n).map { i =>
        val x = if (i == 0) c else lag(c, i).over(w)
        lit((n - i).toDouble) * x
      }.reduce(_ + _) / lit(denom.toDouble)
    def sqlForm(c: String): String =
      (0 until n).map { i =>
        val x = if (i == 0) c else s"lag($c, $i) OVER wh"
        s"${(n - i).toDouble} * $x"
      }.mkString("(", " + ", s") / $denom.0")
    (colForm, sqlForm)
  }

  def w47HullMa(spark: SparkSession, dir: String): DataFrame = {
    val (wma8, _) = wmaTerms(8)
    val (wma16, _) = wmaTerms(16)
    val (wma4, _) = wmaTerms(4)
    Tables.candles(spark, dir)
      .withColumn("wma16", wma16(col("close")))
      .withColumn("h", lit(2.0) * wma8(col("close")) - col("wma16"))
      .select(col("user_id"), col("bucket"),
        round(col("wma16"), 6).as("wma_16"),
        round(wma4(col("h")), 6).as("hma_16"))
  }

  val w47Sql: String = {
    val (_, wma8) = wmaTerms(8)
    val (_, wma16) = wmaTerms(16)
    val (_, wma4) = wmaTerms(4)
    Tables.candlesSql +
      s""", h1 AS (
         |  SELECT user_id, bucket,
         |         ${wma16("close")} AS wma16,
         |         2.0 * ${wma8("close")} - ${wma16("close")} AS h
         |  FROM candles
         |  WINDOW wh AS (PARTITION BY user_id ORDER BY bucket))
         |SELECT user_id, bucket,
         |       round(wma16, 6) + 0 AS wma_16,
         |       round(${wma4("h")}, 6) + 0 AS hma_16
         |FROM h1
         |WINDOW wh AS (PARTITION BY user_id ORDER BY bucket)""".stripMargin
  }

  // ---------------------------------------------------------------- W48
  /** W48 — Chande Momentum Oscillator 14 + Elder Ray 13.
    *
    * CMO = 100·(Σgains − Σlosses)/(Σgains + Σlosses) over 14 — the
    * RSI numerator/denominator pair re-normalized to [−100, 100].
    * Elder Ray: bull = high − EMA₁₃(close), bear = low − EMA₁₃(close)
    * (ewm adjust=True via [[graft.functions.EwmAvg]]; oracle uses the
    * normalized-weight identity, the W4 pattern). */
  def w48CmoElder(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val d = col("close") - lag(col("close"), 1).over(w)
    val base = Tables.candles(spark, dir)
      .withColumn("g", gains(d))
      .withColumn("l", losses(d))
      .withColumn("ema13", GraftFunctions.ewmAvgSpan(col("close"), 13).over(grow))
    val sg = rollSum(col("g"), 14, w)
    val sl = rollSum(col("l"), 14, w)
    base.select(col("user_id"), col("bucket"),
      round(lit(100.0) * safeDiv(sg - sl, sg + sl), 6).as("cmo_14"),
      round(col("high") - col("ema13"), 6).as("bull_power"),
      round(col("low") - col("ema13"), 6).as("bear_power"))
  }

  val w48Sql: String = Tables.candlesSql +
    s""", c1 AS (
       |  SELECT user_id, bucket, high, low, close,
       |    close - lag(close) OVER wc AS d,
       |    pow(1.0 / (1.0 - (2.0 / 14.0)), CAST(count(close) OVER wcg AS DOUBLE)) AS uw
       |  FROM candles
       |  WINDOW wc AS (PARTITION BY user_id ORDER BY bucket),
       |         wcg AS (wc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |c2 AS (
       |  SELECT user_id, bucket, high, low,
       |    CASE WHEN d IS NOT NULL THEN CASE WHEN d > 0 THEN d ELSE 0.0 END END AS g,
       |    CASE WHEN d IS NOT NULL THEN CASE WHEN d < 0 THEN -d ELSE 0.0 END END AS l,
       |    sum(close * uw) OVER wcg2 / sum(uw) OVER wcg2 AS ema13
       |  FROM c1
       |  WINDOW wc2 AS (PARTITION BY user_id ORDER BY bucket),
       |         wcg2 AS (wc2 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, bucket,
       |  round(100.0 *
       |    ((CASE WHEN count(g) OVER w14c = 14 THEN sum(g) OVER w14c END) -
       |     (CASE WHEN count(l) OVER w14c = 14 THEN sum(l) OVER w14c END)) /
       |    nullif((CASE WHEN count(g) OVER w14c = 14 THEN sum(g) OVER w14c END) +
       |           (CASE WHEN count(l) OVER w14c = 14 THEN sum(l) OVER w14c END), 0),
       |    6) + 0 AS cmo_14,
       |  round(high - ema13, 6) + 0 AS bull_power,
       |  round(low - ema13, 6) + 0 AS bear_power
       |FROM c2
       |WINDOW wc3 AS (PARTITION BY user_id ORDER BY bucket),
       |       w14c AS (wc3 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W49
  /** W49 — GARCH(1,1) conditional volatility, pinned parameters
    * (ω, α, β) = (2e-8, 0.06, 0.92) — the "RiskMetrics-plus-drift"
    * configuration a desk would fit offline and apply as broadcast
    * config (the Renko brick-size pattern: fit elsewhere, fold here).
    *
    * σ²ₜ = ω + α·r²ₜ₋₁ + β·σ²ₜ₋₁ over simple returns
    * (pure arithmetic — no ln, so the recurrence is cross-engine
    * bit-exact), seeded σ² = r² at each key's FIRST return row. The
    * per-key fold state is two doubles; the oracle replays the
    * identical expression order in a lockstep recursive CTE. Output in
    * basis points (10⁴·σ) so 6-decimal rounding keeps ~7 significant
    * digits of a ~1e-3-scale vol.
    *
    * Zero-price rule (engine-wide, pinned here and in
    * [[graft.streaming.Channels.garchVolStream]]): a return is
    * UNDEFINED when the previous close is 0 ([[safeDiv]] → null —
    * the reference treats non-positive prices as dirty data, F2,
    * `data_quality.py:189-209`). Undefined returns are SKIPPED: no
    * row is emitted and the fold state persists across the gap, so
    * the next defined return continues the recurrence from the last
    * defined one. The oracle replays the identical choice by
    * re-numbering the non-null returns before the recursive join. */
  private[graft] val GarchOmega = 2.0e-8
  private[graft] val GarchAlpha = 0.06
  private[graft] val GarchBeta  = 0.92

  /** One GARCH(1,1) transition — fold a new return into the state.
    * Expression ORDER mirrors [[w49Sql]]'s recursive member
    * term-for-term so the doubles come out bit-identical. */
  private[graft] def garchStep(st: GarchCore, r: Double): GarchCore =
    if (!st.seeded) GarchCore(r, r * r, seeded = true)
    else GarchCore(r,
      GarchOmega + GarchAlpha * (st.prevR * st.prevR) + GarchBeta * st.s2,
      seeded = true)

  def w49GarchVol(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pc = lag(col("close"), 1).over(w)
    val prepared = Tables.candles(spark, dir)
      .withColumn("r", safeDiv(col("close") - pc, pc))
      .select(col("user_id"), col("bucket"), col("r"))
      .as[GarchIn]
    prepared
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[GarchIn]) =>
        var core = GarchCore(0.0, 0.0, seeded = false)
        rows.flatMap { row =>
          row.r match {
            case Some(r) =>
              core = garchStep(core, r)
              Iterator.single(GarchRow(uid, row.bucket, r,
                10000.0 * math.sqrt(core.s2)))
            case None => Iterator.empty
          }
        }
      }
      .select(col("user_id"), col("bucket"),
        round(col("ret"), 6).as("ret"),
        round(col("cond_vol_bp"), 6).as("cond_vol_bp"))
  }

  val w49Sql: String =
    s"""$recursiveCandles,
       |g49 AS MATERIALIZED (
       |  SELECT user_id, bucket, r,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn
       |  FROM (
       |    SELECT user_id, bucket,
       |           (close - lag(close) OVER gw49) / nullif(lag(close) OVER gw49, 0) AS r
       |    FROM candles
       |    WINDOW gw49 AS (PARTITION BY user_id ORDER BY bucket))
       |  WHERE r IS NOT NULL),
       |gv(user_id, rn, bucket, r, s2) AS (
       |  SELECT user_id, rn, bucket, r, r * r FROM g49 WHERE rn = 1
       |  UNION ALL
       |  SELECT c.user_id, c.rn, c.bucket, c.r,
       |         0.00000002 + 0.06 * (p.r * p.r) + 0.92 * p.s2
       |  FROM gv p JOIN g49 c ON c.user_id = p.user_id AND c.rn = p.rn + 1)
       |SELECT user_id, bucket, round(r, 6) + 0 AS ret,
       |       round(10000.0 * sqrt(s2), 6) + 0 AS cond_vol_bp
       |FROM gv""".stripMargin

  // ---------------------------------------------------------------- W50
  /** W50 — range-based volatility estimators over 20 bars: Parkinson,
    * Garman-Klass, Rogers-Satchell — the OHLC-range family that
    * extracts 5–8× more information per bar than close-to-close vol
    * (each per-bar term uses the high/low range the close-only
    * estimator throws away). Pure window `Column`s on the shared
    * per-symbol exchange: per-bar ln terms, then an explicit
    * `sum/20` (not `avg`, so both engines divide the same sum once).
    * Output in basis points; null through the 20-bar warmup via the
    * engine-wide count-guard idiom. ln crosses engines safely here for
    * the same reason the token-NLL family does: correctly-rounded ln
    * inputs far from the 6th-decimal round boundary.
    *
    * Zero-price rule (the w49 decision applied to a framed
    * estimator): a bar with any non-positive OHLC field (dirty data
    * per the reference's F2 band filter) has UNDEFINED ln-range
    * terms — every per-bar term is gated on bar validity, so such
    * bars contribute null and the existing 20-bar count-guard nulls
    * every window that touches one. The oracle mirrors the same
    * CASE gate term-for-term. */
  def w50RangeVol(spark: SparkSession, dir: String): DataFrame = {
    val L2 = 0.6931471805599453 // ln 2, the same literal the oracle uses
    val valid = col("open") > 0 && col("high") > 0 &&
      col("low") > 0 && col("close") > 0
    def lnr(a: Column, b: Column): Column = when(valid, log(a / b))
    val lnHL = lnr(col("high"), col("low"))
    val lnCO = lnr(col("close"), col("open"))
    val base = Tables.candles(spark, dir)
      .withColumn("pk", lnHL * lnHL)
      .withColumn("gk", lit(0.5) * lnHL * lnHL -
        lit(2 * L2 - 1) * lnCO * lnCO)
      .withColumn("rs",
        lnr(col("high"), col("close")) * lnr(col("high"), col("open")) +
        lnr(col("low"), col("close")) * lnr(col("low"), col("open")))
    val w20 = w.rowsBetween(-19, 0)
    def vol20(c: Column): Column =
      when(count(c).over(w20) === 20, sqrt(sum(c).over(w20) / 20.0) * 10000.0)
    base.select(col("user_id"), col("bucket"),
      round(vol20(col("pk") / lit(4 * L2)), 6).as("parkinson_bp"),
      round(vol20(col("gk")), 6).as("garman_klass_bp"),
      round(vol20(col("rs")), 6).as("rogers_satchell_bp"))
  }

  val w50Sql: String = Tables.candlesSql +
    s""", v50b AS (
       |  SELECT user_id, bucket, high, low, close, open,
       |         (open > 0 AND high > 0 AND low > 0 AND close > 0) AS ok
       |  FROM candles),
       |v50 AS (
       |  SELECT user_id, bucket,
       |    CASE WHEN ok THEN ln(high / low) * ln(high / low) END AS pk,
       |    CASE WHEN ok THEN 0.5 * ln(high / low) * ln(high / low) -
       |      ${2 * 0.6931471805599453 - 1} * ln(close / open) * ln(close / open) END AS gk,
       |    CASE WHEN ok THEN ln(high / close) * ln(high / open) +
       |      ln(low / close) * ln(low / open) END AS rs
       |  FROM v50b)
       |SELECT user_id, bucket,
       |  round(CASE WHEN count(pk) OVER v50w = 20
       |             THEN sqrt(sum(pk / ${4 * 0.6931471805599453}) OVER v50w / 20.0) * 10000.0 END, 6) + 0
       |    AS parkinson_bp,
       |  round(CASE WHEN count(gk) OVER v50w = 20
       |             THEN sqrt(sum(gk) OVER v50w / 20.0) * 10000.0 END, 6) + 0
       |    AS garman_klass_bp,
       |  round(CASE WHEN count(rs) OVER v50w = 20
       |             THEN sqrt(sum(rs) OVER v50w / 20.0) * 10000.0 END, 6) + 0
       |    AS rogers_satchell_bp
       |FROM v50
       |WINDOW v50b AS (PARTITION BY user_id ORDER BY bucket),
       |       v50w AS (v50b ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w46_kama"      -> (w46Kama _),
    "w47_hull_ma"   -> (w47HullMa _),
    "w48_cmo_elder" -> (w48CmoElder _),
    "w49_garch_vol" -> (w49GarchVol _),
    "w50_range_vol" -> (w50RangeVol _))

  def oracles: Map[String, String] = Map(
    "w46_kama"      -> w46Sql,
    "w47_hull_ma"   -> w47Sql,
    "w48_cmo_elder" -> w48Sql,
    "w49_garch_vol" -> w49Sql,
    "w50_range_vol" -> w50Sql)
}
