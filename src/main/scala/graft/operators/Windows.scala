package graft.operators

import graft.Tables
import graft.features.Indicators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Window-function operators, batch 1 — SURVEY §2.7 (W1–W15, W20–W23,
  * W28, W35). All run over hourly candles derived from `events`
  * (FIXTURES.md A): `user_id` plays the symbol key, so windows are
  * partition-parallel across 1500+ keys at sf0.1 — the scale story is
  * one exchange on user_id + one sort, shared by every window spec.
  *
  * Oracles share the candle CTE (`Tables.candlesSql`) so both engines
  * window over identical frames; every ratio uses NULLIF-on-zero to match
  * [[graft.features.Indicators.safeDiv]].
  */
object Windows {

  private val w = W()

  private def candleBase(spark: SparkSession, dir: String): DataFrame =
    Tables.candles(spark, dir)

  /** Shared SQL window declarations appended after the final SELECT. */
  private def windowClause(frames: Int*): String = {
    val named = frames.distinct.map(n => s"w$n AS (w ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)")
    ("WINDOW w AS (PARTITION BY user_id ORDER BY bucket)" +: named).mkString(", ")
  }

  // ---------------------------------------------------------------- W1
  /** W1 — LAG gap detection (`repository.py:341-397`): events more than
    * 2 h apart per user, with missing-hour count. */
  def w1Gaps(spark: SparkSession, dir: String): DataFrame = {
    val we = W(time = "ts")
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(we))
      .withColumn("gap_seconds", unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      .filter(col("gap_seconds") > 7200)
      .withColumn("missing_hours", floor(col("gap_seconds") / 3600) - 1)
      .select(col("user_id"), col("prev_ts"), col("ts"), col("gap_seconds"), col("missing_hours"))
  }

  val w1Sql: String =
    """SELECT user_id, prev_ts, ts,
      |       CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_seconds,
      |       CAST(floor(date_diff('second', prev_ts, ts) / 3600) - 1 AS BIGINT) AS missing_hours
      |FROM (SELECT user_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |      FROM events) t
      |WHERE date_diff('second', prev_ts, ts) > 7200""".stripMargin

  // ---------------------------------------------------------------- W2/W3
  /** W2+W3 — diff, pct_change, SMA 5/10/20 (`feature_engineer.py:95-121`). */
  def w2w3SmaReturns(spark: SparkSession, dir: String): DataFrame =
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(diff(col("close"), w), 6).as("close_diff"),
      round(pctChange(col("close"), w), 6).as("close_ret"),
      round(sma(col("close"), 5, w), 6).as("sma_5"),
      round(sma(col("close"), 10, w), 6).as("sma_10"),
      round(sma(col("close"), 20, w), 6).as("sma_20"))

  val w2w3Sql: String = Tables.candlesSql +
    """
      |SELECT user_id, bucket,
      |  round(close - lag(close) OVER w, 6) + 0 AS close_diff,
      |  round((close - lag(close) OVER w) / nullif(lag(close) OVER w, 0), 6) + 0 AS close_ret,
      |  round(CASE WHEN count(close) OVER w5  = 5  THEN avg(close) OVER w5  END, 6) + 0 AS sma_5,
      |  round(CASE WHEN count(close) OVER w10 = 10 THEN avg(close) OVER w10 END, 6) + 0 AS sma_10,
      |  round(CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END, 6) + 0 AS sma_20
      |FROM candles
      |""".stripMargin + windowClause(5, 10, 20)

  // ---------------------------------------------------------------- W5
  /** W5 — RSI-14, simple rolling variant (`backtesting_engine.py:213-221`). */
  def w5Rsi(spark: SparkSession, dir: String): DataFrame = {
    val base = candleBase(spark, dir)
      .withColumn("d", diff(col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(rsiSimple(col("d"), 14, w), 6).as("rsi_14"))
  }

  val w5Sql: String = Tables.candlesSql +
    """, d1 AS (
      |  SELECT user_id, bucket,
      |         close - lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS d
      |  FROM candles),
      |d2 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN d IS NOT NULL THEN CASE WHEN d > 0 THEN d  ELSE 0.0 END END AS gain,
      |    CASE WHEN d IS NOT NULL THEN CASE WHEN d < 0 THEN -d ELSE 0.0 END END AS loss
      |  FROM d1),
      |d3 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN count(gain) OVER w14 = 14 THEN avg(gain) OVER w14 END AS g,
      |    CASE WHEN count(loss) OVER w14 = 14 THEN avg(loss) OVER w14 END AS l
      |  FROM d2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(CASE WHEN g IS NULL OR l IS NULL THEN NULL
      |             WHEN l = 0 AND g = 0 THEN NULL
      |             WHEN l = 0 THEN 100.0
      |             ELSE 100.0 - 100.0 / (1.0 + g / l) END, 6) + 0 AS rsi_14
      |FROM d3""".stripMargin

  // ---------------------------------------------------------------- W7
  /** W7 — Bollinger(20, 2σ) + width + %B (`feature_engineer.py:163-187`). */
  def w7Bollinger(spark: SparkSession, dir: String): DataFrame = {
    val bb = bollinger(col("close"), 20, 2.0, w)
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(bb.middle, 6).as("bb_middle"),
      round(bb.upper, 6).as("bb_upper"),
      round(bb.lower, 6).as("bb_lower"),
      round(bb.width, 6).as("bb_width"),
      round(bb.pctB, 6).as("bb_pct_b"))
  }

  val w7Sql: String = Tables.candlesSql +
    """, b AS (
      |  SELECT user_id, bucket, close,
      |    CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END AS mid,
      |    CASE WHEN count(close) OVER w20 = 20 THEN stddev_samp(close) OVER w20 END AS sd
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(mid, 6) + 0 AS bb_middle,
      |  round(mid + 2 * sd, 6) + 0 AS bb_upper,
      |  round(mid - 2 * sd, 6) + 0 AS bb_lower,
      |  round((mid + 2 * sd - (mid - 2 * sd)) / nullif(mid, 0), 6) + 0 AS bb_width,
      |  round((close - (mid - 2 * sd)) / nullif(mid + 2 * sd - (mid - 2 * sd), 0), 6) + 0 AS bb_pct_b
      |FROM b""".stripMargin

  // ---------------------------------------------------------------- W8
  /** W8 — ATR-14 (rolling-mean TR variant,
    * `advanced_feature_engineer.py:216-221`). */
  def w8Atr(spark: SparkSession, dir: String): DataFrame = {
    val base = candleBase(spark, dir)
      .withColumn("tr", trueRange(col("high"), col("low"), col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(col("tr"), 6).as("true_range"),
      round(sma(col("tr"), 14, w), 6).as("atr_14"))
  }

  val w8Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, high, low, close,
      |         lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
      |  FROM candles),
      |t2 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN pc IS NOT NULL
      |         THEN greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
      |  FROM t1)
      |SELECT user_id, bucket, round(tr, 6) + 0 AS true_range,
      |  round(CASE WHEN count(tr) OVER w14 = 14 THEN avg(tr) OVER w14 END, 6) + 0 AS atr_14
      |FROM t2
      |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |       w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W10/W12
  /** W10+W12 — rolling volatility of returns ×100 and momentum-n
    * (`feature_engineer.py:234-256`). */
  def w10Volatility(spark: SparkSession, dir: String): DataFrame = {
    val base = candleBase(spark, dir)
      .withColumn("ret", pctChange(col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(rollStd(col("ret"), 10, w) * 100, 6).as("volatility_10"),
      round(rollStd(col("ret"), 30, w) * 100, 6).as("volatility_30"),
      round(momentum(col("close"), 5, w), 6).as("momentum_5"),
      round(momentum(col("close"), 10, w), 6).as("momentum_10"))
  }

  val w10Sql: String = Tables.candlesSql +
    """, r AS (
      |  SELECT user_id, bucket, close,
      |    (close - lag(close) OVER w) / nullif(lag(close) OVER w, 0) AS ret,
      |    lag(close, 5) OVER w AS c5, lag(close, 10) OVER w AS c10
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket))
      |SELECT user_id, bucket,
      |  round(CASE WHEN count(ret) OVER w10 = 10 THEN stddev_samp(ret) OVER w10 END * 100, 6) + 0 AS volatility_10,
      |  round(CASE WHEN count(ret) OVER w30 = 30 THEN stddev_samp(ret) OVER w30 END * 100, 6) + 0 AS volatility_30,
      |  round(close / nullif(c5, 0) - 1, 6) + 0 AS momentum_5,
      |  round(close / nullif(c10, 0) - 1, 6) + 0 AS momentum_10
      |FROM r
      |""".stripMargin + windowClause(10, 30)

  // ---------------------------------------------------------------- W11
  /** W11 — price position / support / resistance distances
    * (`feature_engineer.py:242-272`). */
  def w11PricePosition(spark: SparkSession, dir: String): DataFrame = {
    val hh = rollMax(col("high"), 20, w); val ll = rollMin(col("low"), 20, w)
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(hh, 6).as("resistance_20"),
      round(ll, 6).as("support_20"),
      round(safeDiv(col("close") - ll, hh - ll), 6).as("price_position"),
      round(safeDiv(col("close") - ll, col("close")), 6).as("dist_to_support"),
      round(safeDiv(hh - col("close"), col("close")), 6).as("dist_to_resistance"))
  }

  val w11Sql: String = Tables.candlesSql +
    """, b AS (
      |  SELECT user_id, bucket, close,
      |    CASE WHEN count(high) OVER w20 = 20 THEN max(high) OVER w20 END AS hh,
      |    CASE WHEN count(low)  OVER w20 = 20 THEN min(low)  OVER w20 END AS ll
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(hh, 6) + 0 AS resistance_20, round(ll, 6) + 0 AS support_20,
      |  round((close - ll) / nullif(hh - ll, 0), 6) + 0 AS price_position,
      |  round((close - ll) / nullif(close, 0), 6) + 0 AS dist_to_support,
      |  round((hh - close) / nullif(close, 0), 6) + 0 AS dist_to_resistance
      |FROM b""".stripMargin

  // ---------------------------------------------------------------- W13
  /** W13 — candle anatomy + doji flag (`feature_engineer.py:274-281`):
    * pure column arithmetic, no window at all. */
  def w13Anatomy(spark: SparkSession, dir: String): DataFrame =
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(abs(col("close") - col("open")), 6).as("body"),
      round(col("high") - col("low"), 6).as("candle_range"),
      round(col("high") - greatest(col("open"), col("close")), 6).as("upper_shadow"),
      round(least(col("open"), col("close")) - col("low"), 6).as("lower_shadow"),
      (abs(col("close") - col("open")) < lit(0.1) * (col("high") - col("low"))).as("is_doji"))

  val w13Sql: String = Tables.candlesSql +
    """
      |SELECT user_id, bucket,
      |  round(abs(close - open), 6) + 0 AS body,
      |  round(high - low, 6) + 0 AS candle_range,
      |  round(high - greatest(open, close), 6) + 0 AS upper_shadow,
      |  round(least(open, close) - low, 6) + 0 AS lower_shadow,
      |  abs(close - open) < 0.1 * (high - low) AS is_doji
      |FROM candles""".stripMargin

  // ---------------------------------------------------------------- W14/W15
  /** W14+W15 — Williams %R and Stochastic %K/%D
    * (`advanced_feature_engineer.py:81-98`). %D is a nested window (SMA3
    * of %K) — two layered selects, still one shuffle. */
  def w14w15Oscillators(spark: SparkSession, dir: String): DataFrame = {
    val base = candleBase(spark, dir)
      .withColumn("williams_r", williamsR(col("high"), col("low"), col("close"), 14, w))
      .withColumn("stoch_k", stochK(col("high"), col("low"), col("close"), 14, w))
    base.select(
      col("user_id"), col("bucket"),
      round(col("williams_r"), 6).as("williams_r"),
      round(col("stoch_k"), 6).as("stoch_k"),
      round(sma(col("stoch_k"), 3, w), 6).as("stoch_d"))
  }

  val w14w15Sql: String = Tables.candlesSql +
    """, b AS (
      |  SELECT user_id, bucket,
      |    -100.0 * ((hh - close) / nullif(hh - ll, 0)) AS williams_r,
      |    (close - ll) / nullif(hh - ll, 0) * 100.0 AS stoch_k
      |  FROM (SELECT user_id, bucket, close,
      |          CASE WHEN count(high) OVER w14 = 14 THEN max(high) OVER w14 END AS hh,
      |          CASE WHEN count(low)  OVER w14 = 14 THEN min(low)  OVER w14 END AS ll
      |        FROM candles
      |        WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |               w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) t)
      |SELECT user_id, bucket,
      |  round(williams_r, 6) + 0 AS williams_r,
      |  round(stoch_k, 6) + 0 AS stoch_k,
      |  round(CASE WHEN count(stoch_k) OVER w3 = 3 THEN avg(stoch_k) OVER w3 END, 6) + 0 AS stoch_d
      |FROM b
      |""".stripMargin + windowClause(3)

  // ---------------------------------------------------------------- W20/W21
  /** W20+W21 — Keltner and Donchian channels
    * (`advanced_feature_engineer.py:210-233`). */
  def w20w21Channels(spark: SparkSession, dir: String): DataFrame = {
    val tp = (col("high") + col("low") + col("close")) / 3
    val base = candleBase(spark, dir)
      .withColumn("tp", tp)
      .withColumn("tr", trueRange(col("high"), col("low"), col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(sma(col("tp"), 20, w), 6).as("kc_middle"),
      round(sma(col("tp"), 20, w) + lit(2.0) * sma(col("tr"), 14, w), 6).as("kc_upper"),
      round(sma(col("tp"), 20, w) - lit(2.0) * sma(col("tr"), 14, w), 6).as("kc_lower"),
      round(rollMax(col("high"), 20, w), 6).as("dc_upper"),
      round(rollMin(col("low"), 20, w), 6).as("dc_lower"),
      round((rollMax(col("high"), 20, w) + rollMin(col("low"), 20, w)) / 2, 6).as("dc_middle"))
  }

  val w20w21Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, high, low,
      |         (high + low + close) / 3 AS tp,
      |         lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
      |  FROM candles),
      |t2 AS (
      |  SELECT user_id, bucket, high, low, tp,
      |    CASE WHEN pc IS NOT NULL
      |         THEN greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
      |  FROM t1),
      |t3 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN count(tp) OVER w20 = 20 THEN avg(tp) OVER w20 END AS ma_tp,
      |    CASE WHEN count(tr) OVER w14 = 14 THEN avg(tr) OVER w14 END AS atr,
      |    CASE WHEN count(high) OVER w20 = 20 THEN max(high) OVER w20 END AS dc_u,
      |    CASE WHEN count(low)  OVER w20 = 20 THEN min(low)  OVER w20 END AS dc_l
      |  FROM t2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
      |         w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(ma_tp, 6) + 0 AS kc_middle,
      |  round(ma_tp + 2.0 * atr, 6) + 0 AS kc_upper,
      |  round(ma_tp - 2.0 * atr, 6) + 0 AS kc_lower,
      |  round(dc_u, 6) + 0 AS dc_upper, round(dc_l, 6) + 0 AS dc_lower,
      |  round((dc_u + dc_l) / 2, 6) + 0 AS dc_middle
      |FROM t3""".stripMargin

  // ---------------------------------------------------------------- W22/W35
  /** W22+W35 — OBV running sum and drawdown from running peak
    * (`advanced_feature_engineer.py:235-252`; `backtesting_engine.py:107-129`). */
  def w22w35Cumulative(spark: SparkSession, dir: String): DataFrame =
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(obvProxy(col("close"), col("high"), col("low"), w), 6).as("obv"),
      round(runningPeak(col("close"), w), 6).as("running_peak"),
      round(drawdown(col("close"), w), 6).as("drawdown"))

  val w22w35Sql: String = Tables.candlesSql +
    """, d AS (
      |  SELECT user_id, bucket, high, low, close,
      |         close - lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS dc
      |  FROM candles)
      |SELECT user_id, bucket,
      |  round(sum(CASE WHEN dc > 0 THEN high - low
      |                 WHEN dc < 0 THEN -(high - low) ELSE 0.0 END) OVER wc, 6) + 0 AS obv,
      |  round(max(close) OVER wc, 6) + 0 AS running_peak,
      |  round((max(close) OVER wc - close) / nullif(max(close) OVER wc, 0), 6) + 0 AS drawdown
      |FROM d
      |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |       wc AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W23
  /** W23 — Ultimate Oscillator (7,14,28)
    * (`advanced_feature_engineer.py:254-287`). */
  def w23Ultimate(spark: SparkSession, dir: String): DataFrame = {
    val pc = lag(col("close"), 1).over(w)
    val base = candleBase(spark, dir)
      .withColumn("bp", when(pc.isNotNull, col("close") - least(col("low"), pc)))
      .withColumn("tr", when(pc.isNotNull, greatest(col("high"), pc) - least(col("low"), pc)))
    val a7  = safeDiv(rollSum(col("bp"), 7, w),  rollSum(col("tr"), 7, w))
    val a14 = safeDiv(rollSum(col("bp"), 14, w), rollSum(col("tr"), 14, w))
    val a28 = safeDiv(rollSum(col("bp"), 28, w), rollSum(col("tr"), 28, w))
    base.select(
      col("user_id"), col("bucket"),
      round(lit(100.0) * (lit(4.0) * a7 + lit(2.0) * a14 + a28) / 7.0, 6).as("ultimate_osc"))
  }

  val w23Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, high, low, close,
      |         lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
      |  FROM candles),
      |t2 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN pc IS NOT NULL THEN close - least(low, pc) END AS bp,
      |    CASE WHEN pc IS NOT NULL THEN greatest(high, pc) - least(low, pc) END AS tr
      |  FROM t1),
      |t3 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN count(bp) OVER w7  = 7  THEN sum(bp) OVER w7  END /
      |      nullif(CASE WHEN count(tr) OVER w7  = 7  THEN sum(tr) OVER w7  END, 0) AS a7,
      |    CASE WHEN count(bp) OVER w14 = 14 THEN sum(bp) OVER w14 END /
      |      nullif(CASE WHEN count(tr) OVER w14 = 14 THEN sum(tr) OVER w14 END, 0) AS a14,
      |    CASE WHEN count(bp) OVER w28 = 28 THEN sum(bp) OVER w28 END /
      |      nullif(CASE WHEN count(tr) OVER w28 = 28 THEN sum(tr) OVER w28 END, 0) AS a28
      |  FROM t2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w7  AS (w ROWS BETWEEN 6  PRECEDING AND CURRENT ROW),
      |         w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
      |         w28 AS (w ROWS BETWEEN 27 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(100.0 * (4.0 * a7 + 2.0 * a14 + a28) / 7.0, 6) + 0 AS ultimate_osc
      |FROM t3""".stripMargin

  // ---------------------------------------------------------------- W28
  /** W28 — open-gap detection (`market_filters.py:161-184`). */
  def w28OpenGap(spark: SparkSession, dir: String): DataFrame = {
    val pc = lag(col("close"), 1).over(w)
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(safeDiv(col("open") - pc, pc) * 100, 6).as("gap_pct"),
      when(pc.isNull, lit(null))
        .when(col("open") > pc, "up")
        .when(col("open") < pc, "down")
        .otherwise("flat").as("gap_direction"),
      (abs(safeDiv(col("open") - pc, pc) * 100) > 0.1).as("is_significant_gap"))
  }

  val w28Sql: String = Tables.candlesSql +
    """, g AS (
      |  SELECT user_id, bucket, open,
      |         lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
      |  FROM candles)
      |SELECT user_id, bucket,
      |  round((open - pc) / nullif(pc, 0) * 100, 6) + 0 AS gap_pct,
      |  CASE WHEN pc IS NULL THEN NULL
      |       WHEN open > pc THEN 'up'
      |       WHEN open < pc THEN 'down' ELSE 'flat' END AS gap_direction,
      |  abs((open - pc) / nullif(pc, 0) * 100) > 0.1 AS is_significant_gap
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- W9
  /** W9 — volume SMA 10/20/50 + volume ratio
    * (`feature_engineer.py:206-219`): pandas `rolling(n).mean()` has
    * warmup nulls (min_periods = window), the ratio is
    * `volume / volume_sma_20` with `fillna(1.0)` — warmup rows read 1.0;
    * sma_20 can never be 0 (candle volume = count ≥ 1), so the fill is
    * the only null source. */
  def w9VolumeSma(spark: SparkSession, dir: String): DataFrame =
    candleBase(spark, dir).select(
      col("user_id"), col("bucket"),
      round(sma(col("volume"), 10, w), 6).as("volume_sma_10"),
      round(sma(col("volume"), 20, w), 6).as("volume_sma_20"),
      round(sma(col("volume"), 50, w), 6).as("volume_sma_50"),
      round(coalesce(col("volume") / sma(col("volume"), 20, w), lit(1.0)), 6)
        .as("volume_ratio"))

  val w9Sql: String = Tables.candlesSql +
    """
      |SELECT user_id, bucket,
      |  round(CASE WHEN count(volume) OVER w10 = 10 THEN avg(volume) OVER w10 END, 6) + 0 AS volume_sma_10,
      |  round(CASE WHEN count(volume) OVER w20 = 20 THEN avg(volume) OVER w20 END, 6) + 0 AS volume_sma_20,
      |  round(CASE WHEN count(volume) OVER w50 = 50 THEN avg(volume) OVER w50 END, 6) + 0 AS volume_sma_50,
      |  round(coalesce(volume / (CASE WHEN count(volume) OVER w20 = 20 THEN avg(volume) OVER w20 END), 1.0), 6) + 0 AS volume_ratio
      |FROM candles
      |""".stripMargin + windowClause(10, 20, 50)

  // ---------------------------------------------------------------- W38
  /** W38 — Ichimoku cloud (beyond the reference's indicator set; the
    * remaining canonical FOREX system its TA surface lacks): tenkan
    * (9-period midpoint), kijun (26), senkou A = displaced midpoint of
    * the two, senkou B = displaced 52-period midpoint, chikou = close
    * displaced backward, plus the cloud position signal. All five lines
    * are rolling max/min + lag/lead over the per-user candle window —
    * the same single exchange + sort every other w-series spec rides;
    * warmup rows null out via the full-window count guard. */
  def w38Ichimoku(spark: SparkSession, dir: String): DataFrame = {
    val mid = (n: Int) =>
      (rollMax(col("high"), n, w) + rollMin(col("low"), n, w)) / 2
    val sa = lag((col("tenkan") + col("kijun")) / 2, 26).over(w)
    val sb = lag(col("sb_raw"), 26).over(w)
    // every line here is a /2- or /4-dyadic midpoint, which lands
    // exactly on .5 at the 6th decimal often enough that Spark's
    // HALF_UP round and DuckDB's half-to-even diverge — same trap and
    // same fix as w39 Heikin-Ashi (Stateful.r6): floor(x·1e6+0.5)/1e6
    // computes identically in both engines
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    candleBase(spark, dir)
      .withColumn("tenkan", mid(9))
      .withColumn("kijun", mid(26))
      .withColumn("sb_raw", mid(52))
      .withColumn("senkou_a", r6(sa))
      .withColumn("senkou_b", r6(sb))
      .select(col("user_id"), col("bucket"),
        r6(col("tenkan")).as("tenkan"),
        r6(col("kijun")).as("kijun"),
        col("senkou_a"), col("senkou_b"),
        round(lead(col("close"), 26).over(w), 6).as("chikou"),
        when(col("senkou_a").isNull || col("senkou_b").isNull, lit(null))
          .when(col("close") > greatest(col("senkou_a"), col("senkou_b")), "above_cloud")
          .when(col("close") < least(col("senkou_a"), col("senkou_b")), "below_cloud")
          .otherwise("in_cloud").as("cloud_position"))
  }

  val w38Sql: String = Tables.candlesSql +
    """, i1 AS (
      |  SELECT user_id, bucket, close,
      |    (CASE WHEN count(*) OVER w9  = 9  THEN max(high) OVER w9  END
      |     + CASE WHEN count(*) OVER w9  = 9  THEN min(low) OVER w9  END) / 2 AS tenkan,
      |    (CASE WHEN count(*) OVER w26 = 26 THEN max(high) OVER w26 END
      |     + CASE WHEN count(*) OVER w26 = 26 THEN min(low) OVER w26 END) / 2 AS kijun,
      |    (CASE WHEN count(*) OVER w52 = 52 THEN max(high) OVER w52 END
      |     + CASE WHEN count(*) OVER w52 = 52 THEN min(low) OVER w52 END) / 2 AS sb_raw
      |  FROM candles
      |  """.stripMargin + windowClause(9, 26, 52) +
    """),
      |i2 AS (
      |  SELECT user_id, bucket, close,
      |    tenkan, kijun,
      |    floor((lag((tenkan + kijun) / 2, 26) OVER wi) * 1e6 + 0.5) / 1e6 AS senkou_a,
      |    floor((lag(sb_raw, 26) OVER wi) * 1e6 + 0.5) / 1e6 AS senkou_b,
      |    lead(close, 26) OVER wi AS chikou_raw
      |  FROM i1 WINDOW wi AS (PARTITION BY user_id ORDER BY bucket))
      |SELECT user_id, bucket,
      |  floor(tenkan * 1e6 + 0.5) / 1e6 AS tenkan,
      |  floor(kijun * 1e6 + 0.5) / 1e6 AS kijun,
      |  senkou_a, senkou_b, round(chikou_raw, 6) + 0 AS chikou,
      |  CASE WHEN senkou_a IS NULL OR senkou_b IS NULL THEN NULL
      |       WHEN close > greatest(senkou_a, senkou_b) THEN 'above_cloud'
      |       WHEN close < least(senkou_a, senkou_b) THEN 'below_cloud'
      |       ELSE 'in_cloud' END AS cloud_position
      |FROM i2""".stripMargin

  // ---------------------------------------------------------------- W43
  /** W43 — anchored VWAP, day anchor: the running Σ(close·vol)/Σ(vol)
    * from each session's first candle, plus the close's deviation from
    * it — the intraday fair-value line traders anchor at the open.
    * Pure cumulative windows over (user, day): same single exchange as
    * the other w-series, deterministic summation order (frame order),
    * denominator ≥ 1 because candle volume is a count. The dyadic-safe
    * floor idiom guards both rounded ratios. */
  def w43AnchoredVwap(spark: SparkSession, dir: String): DataFrame = {
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), to_date(col("bucket")))
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    candleBase(spark, dir)
      .withColumn("av",
        sum(col("close") * col("volume")).over(wd) / sum(col("volume")).over(wd))
      .select(col("user_id"), col("bucket"),
        r6(col("av")).as("anchored_vwap"),
        // NULLIF-on-zero like every engine ratio (a day can open at 0.0)
        r6((col("close") - col("av")) / nullif(col("av"), lit(0)) * 100)
          .as("vwap_dev_pct"))
  }

  val w43Sql: String = Tables.candlesSql +
    """
      |SELECT user_id, bucket,
      |  floor(av * 1e6 + 0.5) / 1e6 AS anchored_vwap,
      |  floor((close - av) / nullif(av, 0) * 100 * 1e6 + 0.5) / 1e6 AS vwap_dev_pct
      |FROM (
      |  SELECT user_id, bucket, close,
      |    sum(close * volume) OVER wv / sum(volume) OVER wv AS av
      |  FROM candles
      |  WINDOW wv AS (PARTITION BY user_id, CAST(bucket AS DATE) ORDER BY bucket
      |                ROWS UNBOUNDED PRECEDING)) t""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w43_anchored_vwap" -> (w43AnchoredVwap _),
    "w38_ichimoku"      -> (w38Ichimoku _),
    "w9_volume_sma"     -> (w9VolumeSma _),
    "w1_gaps"           -> (w1Gaps _),
    "w2_w3_sma_returns" -> (w2w3SmaReturns _),
    "w5_rsi"            -> (w5Rsi _),
    "w7_bollinger"      -> (w7Bollinger _),
    "w8_atr"            -> (w8Atr _),
    "w10_w12_vol_mom"   -> (w10Volatility _),
    "w11_price_position" -> (w11PricePosition _),
    "w13_anatomy"       -> (w13Anatomy _),
    "w14_w15_oscillators" -> (w14w15Oscillators _),
    "w20_w21_channels"  -> (w20w21Channels _),
    "w22_w35_cumulative" -> (w22w35Cumulative _),
    "w23_ultimate"      -> (w23Ultimate _),
    "w28_open_gap"      -> (w28OpenGap _))

  def oracles: Map[String, String] = Map(
    "w43_anchored_vwap" -> w43Sql,
    "w38_ichimoku"      -> w38Sql,
    "w9_volume_sma"     -> w9Sql,
    "w1_gaps"           -> w1Sql,
    "w2_w3_sma_returns" -> w2w3Sql,
    "w5_rsi"            -> w5Sql,
    "w7_bollinger"      -> w7Sql,
    "w8_atr"            -> w8Sql,
    "w10_w12_vol_mom"   -> w10Sql,
    "w11_price_position" -> w11Sql,
    "w13_anatomy"       -> w13Sql,
    "w14_w15_oscillators" -> w14w15Sql,
    "w20_w21_channels"  -> w20w21Sql,
    "w22_w35_cumulative" -> w22w35Sql,
    "w23_ultimate"      -> w23Sql,
    "w28_open_gap"      -> w28Sql)
}
