package graft.operators

import graft.Tables
import graft.features.Indicators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators, batch 2 — SURVEY §2.7 (W16–W18, W24–W27,
  * W29–W33, W36). Same partitioning story as [[Windows]]: everything
  * shares one exchange+sort on (user_id, bucket).
  */
object WindowsAdvanced {

  private val w = W()

  // ---------------------------------------------------------------- W16
  /** W16 — CCI-20 (`advanced_feature_engineer.py:100-110`). MAD is the
    * two-window form avg(|tp − sma(tp)|) where the inner sma is each
    * frame row's own 20-row mean — a deliberate, documented divergence
    * from pandas' rolling-apply (which recentres on the current frame's
    * mean); the oracle computes the identical two-window form. */
  def w16Cci(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.candles(spark, dir)
      .withColumn("tp", (col("high") + col("low") + col("close")) / 3)
      .withColumn("ma_tp", sma(col("tp"), 20, w))
      .withColumn("mad", framed(abs(col("tp") - col("ma_tp")), 20, w)(avg(_).over(_)))
    base.select(
      col("user_id"), col("bucket"),
      round(safeDiv(col("tp") - col("ma_tp"), lit(0.015) * col("mad")), 6).as("cci_20"))
  }

  val w16Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, (high + low + close) / 3 AS tp FROM candles),
      |t2 AS (
      |  SELECT user_id, bucket, tp,
      |    CASE WHEN count(tp) OVER w20 = 20 THEN avg(tp) OVER w20 END AS ma_tp
      |  FROM t1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |t3 AS (
      |  SELECT user_id, bucket, tp, ma_tp,
      |    CASE WHEN count(abs(tp - ma_tp)) OVER w20 = 20
      |         THEN avg(abs(tp - ma_tp)) OVER w20 END AS mad
      |  FROM t2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round((tp - ma_tp) / nullif(0.015 * mad, 0), 6) + 0 AS cci_20
      |FROM t3""".stripMargin

  // ---------------------------------------------------------------- W17
  /** W17 — ADX-14 (`advanced_feature_engineer.py:112-146`): ±DM, smoothed
    * DI±, DX, ADX — all rolling means, chained through the warmup guard. */
  def w17Adx(spark: SparkSession, dir: String): DataFrame = {
    val up = col("high") - lag(col("high"), 1).over(w)
    val dn = lag(col("low"), 1).over(w) - col("low")
    val base = Tables.candles(spark, dir)
      .withColumn("tr", trueRange(col("high"), col("low"), col("close"), w))
      .withColumn("pdm", when(up.isNull || dn.isNull, lit(null))
        .otherwise(when(up > dn && up > 0, up).otherwise(0.0)))
      .withColumn("mdm", when(up.isNull || dn.isNull, lit(null))
        .otherwise(when(dn > up && dn > 0, dn).otherwise(0.0)))
      .withColumn("tr_s", sma(col("tr"), 14, w))
      .withColumn("pdm_s", sma(col("pdm"), 14, w))
      .withColumn("mdm_s", sma(col("mdm"), 14, w))
      .withColumn("di_plus", lit(100.0) * safeDiv(col("pdm_s"), col("tr_s")))
      .withColumn("di_minus", lit(100.0) * safeDiv(col("mdm_s"), col("tr_s")))
      .withColumn("dx", lit(100.0) * safeDiv(abs(col("di_plus") - col("di_minus")),
        col("di_plus") + col("di_minus")))
    base.select(
      col("user_id"), col("bucket"),
      round(col("di_plus"), 6).as("di_plus"),
      round(col("di_minus"), 6).as("di_minus"),
      round(sma(col("dx"), 14, w), 6).as("adx_14"))
  }

  val w17Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, high, low, close,
      |    lag(close) OVER w AS pc,
      |    high - lag(high) OVER w AS up, lag(low) OVER w - low AS dn
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |t2 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN pc IS NOT NULL
      |         THEN greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr,
      |    CASE WHEN up IS NULL OR dn IS NULL THEN NULL
      |         WHEN up > dn AND up > 0 THEN up ELSE 0.0 END AS pdm,
      |    CASE WHEN up IS NULL OR dn IS NULL THEN NULL
      |         WHEN dn > up AND dn > 0 THEN dn ELSE 0.0 END AS mdm
      |  FROM t1),
      |t3 AS (
      |  SELECT user_id, bucket,
      |    100.0 * (CASE WHEN count(pdm) OVER w14 = 14 THEN avg(pdm) OVER w14 END /
      |             nullif(CASE WHEN count(tr) OVER w14 = 14 THEN avg(tr) OVER w14 END, 0)) AS di_plus,
      |    100.0 * (CASE WHEN count(mdm) OVER w14 = 14 THEN avg(mdm) OVER w14 END /
      |             nullif(CASE WHEN count(tr) OVER w14 = 14 THEN avg(tr) OVER w14 END, 0)) AS di_minus
      |  FROM t2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      |t4 AS (
      |  SELECT user_id, bucket, di_plus, di_minus,
      |    100.0 * (abs(di_plus - di_minus) / nullif(di_plus + di_minus, 0)) AS dx
      |  FROM t3)
      |SELECT user_id, bucket,
      |  round(di_plus, 6) + 0 AS di_plus, round(di_minus, 6) + 0 AS di_minus,
      |  round(CASE WHEN count(dx) OVER w14 = 14 THEN avg(dx) OVER w14 END, 6) + 0 AS adx_14
      |FROM t4
      |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |       w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W18
  /** W18 — Aroon up/down 25 (`advanced_feature_engineer.py:148-169`):
    * first-occurrence argmax via array_position over the frame's
    * collected values (np.argmax picks the first max), replacing the
    * reference's Python loop with a builtin-HOF window expression.
    *
    * Deliberate divergence: the reference computes `days_since_high =
    * i − slice_position` (`:164-165`), mixing an absolute row index with
    * a 0..period−1 slice offset, so its aroon drifts by −4 points per
    * row and goes negative past row ~50 — a bug, not a semantic. We
    * implement the published Aroon `(period − days_since)/period·100`,
    * which the reference's formula reduces to only at i == period. */
  def w18Aroon(spark: SparkSession, dir: String): DataFrame = {
    val n = 25
    val f = Wn(w, n)
    val highs = collect_list(col("high")).over(f)
    val lows  = collect_list(col("low")).over(f)
    val idxMax = array_position(highs, array_max(highs)) // 1-based from oldest
    val idxMin = array_position(lows, array_min(lows))
    Tables.candles(spark, dir).select(
      col("user_id"), col("bucket"),
      round(when(count(col("high")).over(f) === n, idxMax * 100.0 / n), 6).as("aroon_up"),
      round(when(count(col("low")).over(f) === n, idxMin * 100.0 / n), 6).as("aroon_down"))
  }

  val w18Sql: String = Tables.candlesSql +
    """, t AS (
      |  SELECT user_id, bucket,
      |    count(high) OVER w25 AS nh,
      |    list(high) OVER w25 AS lh, list(low) OVER w25 AS ll
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w25 AS (w ROWS BETWEEN 24 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(CASE WHEN nh = 25
      |             THEN list_position(lh, list_aggregate(lh, 'max')) * 100.0 / 25 END, 6) + 0 AS aroon_up,
      |  round(CASE WHEN nh = 25
      |             THEN list_position(ll, list_aggregate(ll, 'min')) * 100.0 / 25 END, 6) + 0 AS aroon_down
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- W24
  /** W24 — rolling stats suite (`advanced_feature_engineer.py:289-312`):
    * mean/std/max/min plus sample skew/kurt from moment sums and
    * interpolated quantiles from the sorted frame (no windowed
    * percentile builtin in Spark — SURVEY §7.4). */
  def w24RollStats(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.candles(spark, dir)
      .withColumn("ret", pctChange(col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(sma(col("ret"), 10, w), 6).as("ret_mean_10"),
      round(rollStd(col("ret"), 10, w), 6).as("ret_std_10"),
      round(rollSkew(col("ret"), 10, w), 6).as("ret_skew_10"),
      round(rollKurt(col("ret"), 10, w), 6).as("ret_kurt_10"),
      round(rollQuantile(col("close"), 10, 0.25, w), 6).as("close_q25_10"),
      round(rollQuantile(col("close"), 10, 0.5, w), 6).as("close_median_10"),
      round(rollQuantile(col("close"), 10, 0.75, w), 6).as("close_q75_10"))
  }

  val w24Sql: String = Tables.candlesSql +
    """, r AS (
      |  SELECT user_id, bucket, close,
      |    (close - lag(close) OVER w) / nullif(lag(close) OVER w, 0) AS ret
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |m AS (
      |  SELECT user_id, bucket,
      |    count(ret) OVER w10 AS n,
      |    avg(ret) OVER w10 AS m1, avg(ret * ret) OVER w10 AS m2,
      |    avg(ret * ret * ret) OVER w10 AS m3,
      |    avg(ret * ret * ret * ret) OVER w10 AS m4,
      |    stddev_samp(ret) OVER w10 AS sd,
      |    count(close) OVER w10 AS nc,
      |    quantile_cont(close, 0.25) OVER w10 AS q25,
      |    quantile_cont(close, 0.50) OVER w10 AS q50,
      |    quantile_cont(close, 0.75) OVER w10 AS q75
      |  FROM r
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w10 AS (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(CASE WHEN n = 10 THEN m1 END, 6) + 0 AS ret_mean_10,
      |  round(CASE WHEN n = 10 THEN sd END, 6) + 0 AS ret_std_10,
      |  round(CASE WHEN n = 10 THEN
      |    ((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) /
      |     nullif(pow(m2 - m1 * m1, 1.5), 0)) * sqrt(10.0 * 9) / 8.0 END, 6) + 0 AS ret_skew_10,
      |  round(CASE WHEN n = 10 THEN
      |    ((((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1) /
      |       nullif((m2 - m1 * m1) * (m2 - m1 * m1), 0)) - 3.0) * 11.0 + 6.0) * 9.0 / (8.0 * 7.0)
      |    END, 6) + 0 AS ret_kurt_10,
      |  round(CASE WHEN nc = 10 THEN q25 END, 6) + 0 AS close_q25_10,
      |  round(CASE WHEN nc = 10 THEN q50 END, 6) + 0 AS close_median_10,
      |  round(CASE WHEN nc = 10 THEN q75 END, 6) + 0 AS close_q75_10
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- W25
  /** W25 — rolling correlations (`advanced_feature_engineer.py:314-332`)
    * expanded from moment sums (windowed `corr` is not allowed in Spark). */
  def w25RollCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.candles(spark, dir).select(
      col("user_id"), col("bucket"),
      round(rollCorr(col("high"), col("low"), 20, w), 6).as("corr_high_low_20"),
      round(rollCorr(col("open"), col("close"), 20, w), 6).as("corr_open_close_20"))

  val w25Sql: String = Tables.candlesSql +
    """, m AS (
      |  SELECT user_id, bucket,
      |    count(high * low) OVER w20 AS n1,
      |    avg(high * low) OVER w20 AS mxy1, avg(high) OVER w20 AS mx1, avg(low) OVER w20 AS my1,
      |    stddev_samp(high) OVER w20 AS sx1, stddev_samp(low) OVER w20 AS sy1,
      |    count(open * close) OVER w20 AS n2,
      |    avg(open * close) OVER w20 AS mxy2, avg(open) OVER w20 AS mx2, avg(close) OVER w20 AS my2,
      |    stddev_samp(open) OVER w20 AS sx2, stddev_samp(close) OVER w20 AS sy2
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(CASE WHEN n1 = 20 THEN ((mxy1 - mx1 * my1) * (20.0 / 19.0)) / nullif(sx1 * sy1, 0) END, 6)
      |    AS corr_high_low_20,
      |  round(CASE WHEN n2 = 20 THEN ((mxy2 - mx2 * my2) * (20.0 / 19.0)) / nullif(sx2 * sy2, 0) END, 6)
      |    AS corr_open_close_20
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- W26
  /** W26 — forward-fill of a sparse series
    * (`advanced_feature_engineer.py:380-383`): last non-null over the
    * unbounded-preceding frame + coalesce(0). */
  def w26Ffill(spark: SparkSession, dir: String): DataFrame = {
    val we = W(time = "ts")
    val sparse = when(col("event_type") === "purchase", col("value"))
    Tables.events(spark, dir)
      .withColumn("purchase_value", sparse)
      .withColumn("ffilled",
        coalesce(last(col("purchase_value"), ignoreNulls = true)
          .over(we.rowsBetween(Window.unboundedPreceding, 0)), lit(0.0)))
      .select(col("user_id"), col("ts"), col("purchase_value"),
        round(col("ffilled"), 6).as("ffilled"))
  }

  val w26Sql: String =
    """SELECT user_id, ts,
      |  CASE WHEN event_type = 'purchase' THEN value END AS purchase_value,
      |  round(coalesce(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY ts
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6) + 0 AS ffilled
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- W27
  /** W27 — volatility regime via rolling percent-rank
    * (`market_filters.py:139-159`): rank of the current rolling-range
    * mean among its trailing 50, then bucket. */
  def w27Regime(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.candles(spark, dir)
      .withColumn("rng", col("high") - col("low"))
      .withColumn("avg_range_20", sma(col("rng"), 20, w))
      .withColumn("vol_pct", rollPctRank(col("avg_range_20"), 50, w))
    base.select(
      col("user_id"), col("bucket"),
      round(col("avg_range_20"), 6).as("avg_range_20"),
      round(col("vol_pct"), 6).as("vol_percentile"),
      // thresholds exactly as the reference assigns them
      // (`market_filters.py:154-158`): ≤20% low, ≥95% extreme, ≥80% high
      when(col("vol_pct").isNull, lit(null))
        .when(col("vol_pct") <= 0.20, "low")
        .when(col("vol_pct") >= 0.95, "extreme")
        .when(col("vol_pct") >= 0.80, "high")
        .otherwise("normal").as("vol_regime"))
  }

  val w27Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN count(high - low) OVER w20 = 20 THEN avg(high - low) OVER w20 END AS ar
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |t2 AS (
      |  SELECT user_id, bucket, ar,
      |    CASE WHEN count(ar) OVER w50 = 50
      |         THEN len(list_filter(list(ar) OVER w50, e -> e <= ar)) / 50.0 END AS vol_pct
      |  FROM t1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w50 AS (w ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket,
      |  round(ar, 6) + 0 AS avg_range_20,
      |  round(vol_pct, 6) + 0 AS vol_percentile,
      |  CASE WHEN vol_pct IS NULL THEN NULL
      |       WHEN vol_pct <= 0.20 THEN 'low'
      |       WHEN vol_pct >= 0.95 THEN 'extreme'
      |       WHEN vol_pct >= 0.80 THEN 'high'
      |       ELSE 'normal' END AS vol_regime
      |FROM t2""".stripMargin

  // ---------------------------------------------------------------- W29
  /** W29 — support/resistance levels + touch counts
    * (`pattern_detection.py:288-349`): centered extrema frames replace
    * the reference's O(n·w) Python loops, with its exact geometry —
    * pandas `rolling(20, center=True)` = rows [i−10, i+9], touch loop
    * `range(i−40, i+40)` = rows [i−40, i+39], candidates restricted to
    * `i ∈ [window, n−window)`, min_touches ≥ 2, strength
    * min(1, touches/5), HIGH confidence at ≥ 4 touches. */
  def w29SupportResistance(spark: SparkSession, dir: String): DataFrame = {
    val centered = w.rowsBetween(-10, 9)
    val neigh = w.rowsBetween(-40, 39)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = Tables.candles(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_rows", count(lit(1)).over(wAll))
      .withColumn("in_range", col("rn") >= 21 && col("rn") <= col("n_rows") - 20)
      .withColumn("is_support",
        col("in_range") && col("low") === min(col("low")).over(centered))
      .withColumn("is_resistance",
        col("in_range") && col("high") === max(col("high")).over(centered))
      .withColumn("support_touches",
        size(filter(collect_list(col("low")).over(neigh),
          e => abs(e - col("low")) < col("low") * 0.002)))
      .withColumn("resistance_touches",
        size(filter(collect_list(col("high")).over(neigh),
          e => abs(e - col("high")) < col("high") * 0.002)))
    base.filter((col("is_support") && col("support_touches") >= 2) ||
        (col("is_resistance") && col("resistance_touches") >= 2))
      .select(col("user_id"), col("bucket"),
        round(col("low"), 6).as("low"), round(col("high"), 6).as("high"),
        col("is_support"), col("is_resistance"),
        col("support_touches"), col("resistance_touches"),
        round(when(col("is_support"),
          least(lit(1.0), col("support_touches") / 5.0)), 6).as("support_strength"),
        round(when(col("is_resistance"),
          least(lit(1.0), col("resistance_touches") / 5.0)), 6).as("resistance_strength"),
        when(col("is_support") && col("support_touches") >= 4, "high")
          .when(col("is_support"), "medium").as("support_confidence"),
        when(col("is_resistance") && col("resistance_touches") >= 4, "high")
          .when(col("is_resistance"), "medium").as("resistance_confidence"))
  }

  val w29Sql: String = Tables.candlesSql +
    """, t AS (
      |  SELECT user_id, bucket, low, high,
      |    row_number() OVER w AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_rows,
      |    min(low) OVER wc AS min_c, max(high) OVER wc AS max_c,
      |    CAST(len(list_filter(list(low)  OVER wn, e -> abs(e - low)  < low  * 0.002)) AS INT)
      |      AS support_touches,
      |    CAST(len(list_filter(list(high) OVER wn, e -> abs(e - high) < high * 0.002)) AS INT)
      |      AS resistance_touches
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         wc AS (w ROWS BETWEEN 10 PRECEDING AND 9 FOLLOWING),
      |         wn AS (w ROWS BETWEEN 40 PRECEDING AND 39 FOLLOWING)),
      |f AS (
      |  SELECT *, rn >= 21 AND rn <= n_rows - 20 AS in_range,
      |    (rn >= 21 AND rn <= n_rows - 20) AND low = min_c  AS is_support,
      |    (rn >= 21 AND rn <= n_rows - 20) AND high = max_c AS is_resistance
      |  FROM t)
      |SELECT user_id, bucket, round(low, 6) + 0 AS low, round(high, 6) + 0 AS high,
      |  is_support, is_resistance, support_touches, resistance_touches,
      |  round(CASE WHEN is_support THEN least(1.0, support_touches / 5.0) END, 6)
      |    AS support_strength,
      |  round(CASE WHEN is_resistance THEN least(1.0, resistance_touches / 5.0) END, 6)
      |    AS resistance_strength,
      |  CASE WHEN is_support AND support_touches >= 4 THEN 'high'
      |       WHEN is_support THEN 'medium' END AS support_confidence,
      |  CASE WHEN is_resistance AND resistance_touches >= 4 THEN 'high'
      |       WHEN is_resistance THEN 'medium' END AS resistance_confidence
      |FROM f
      |WHERE (is_support AND support_touches >= 2)
      |   OR (is_resistance AND resistance_touches >= 2)""".stripMargin

  // ---------------------------------------------------------------- W30/W31/W33
  /** W30+W31+W33 — trend change, breakout, strategy signals
    * (`pattern_detection.py:351-463`; `backtesting_engine.py:186-274`):
    * crossing predicates = `cond && !lag(cond)`. */
  def w30w31w33Signals(spark: SparkSession, dir: String): DataFrame = {
    val base0 = Tables.candles(spark, dir)
      .withColumn("sma_5", sma(col("close"), 5, w))
      .withColumn("sma_10", sma(col("close"), 10, w))
      .withColumn("sma_20", sma(col("close"), 20, w))
      .withColumn("bb_up", sma(col("close"), 20, w) + lit(2.0) * rollStd(col("close"), 20, w))
      .withColumn("bb_lo", sma(col("close"), 20, w) - lit(2.0) * rollStd(col("close"), 20, w))
      // FOREX volume proxy exactly as the reference builds it
      // (`pattern_detection.py:414-420`): 5-mean of the range, compared
      // to its own PRIOR-20 average (current row excluded)
      .withColumn("vol_proxy", sma(col("high") - col("low"), 5, w))
      .withColumn("rng_ratio", safeDiv(col("vol_proxy"),
        when(count(col("vol_proxy")).over(w.rowsBetween(-20, -1)) === 20,
          avg(col("vol_proxy")).over(w.rowsBetween(-20, -1)))))
    val above = col("sma_10") > col("sma_20")
    val base = base0
      .withColumn("ma_above", when(col("sma_10").isNotNull && col("sma_20").isNotNull, above))
      .withColumn("prev_above", lag(col("ma_above"), 1).over(w))
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("prev_bb_up", lag(col("bb_up"), 1).over(w))
      .withColumn("prev_bb_lo", lag(col("bb_lo"), 1).over(w))
    base.select(
      col("user_id"), col("bucket"),
      (col("ma_above") && !col("prev_above")).as("trend_cross_up"),
      (!col("ma_above") && col("prev_above")).as("trend_cross_down"),
      // reference strength (`pattern_detection.py:372-376`):
      // min(1, |close − close₋₂₀| / (σ(close₋₂₀..₋₁) · 20)); the null
      // guard must wrap the least() — least SKIPS nulls in both engines,
      // so least(1.0, null) would fabricate 1.0 on warm-up rows
      {
        val ratio = when(count(col("close")).over(w.rowsBetween(-20, -1)) === 20,
          safeDiv(abs(col("close") - lag(col("close"), 20).over(w)),
            stddev(col("close")).over(w.rowsBetween(-20, -1)) * 20))
        round(when(ratio.isNotNull, least(lit(1.0), ratio)), 6).as("trend_strength")
      },
      (col("close") > col("bb_up") && col("prev_close") <= col("prev_bb_up") &&
        col("rng_ratio") > 1.5).as("breakout_up"),
      (col("close") < col("bb_lo") && col("prev_close") >= col("prev_bb_lo") &&
        col("rng_ratio") > 1.5).as("breakout_down"),
      when(col("sma_5") > col("sma_20") &&
             !(lag(col("sma_5"), 1).over(w) > lag(col("sma_20"), 1).over(w)), "buy")
        .when(col("sma_5") < col("sma_20") &&
             !(lag(col("sma_5"), 1).over(w) < lag(col("sma_20"), 1).over(w)), "sell")
        .as("sma_cross_signal"))
  }

  val w30Sql: String = Tables.candlesSql +
    """, b0 AS (
      |  SELECT user_id, bucket, close, high, low,
      |    CASE WHEN count(close) OVER w5  = 5  THEN avg(close) OVER w5  END AS sma_5,
      |    CASE WHEN count(close) OVER w10 = 10 THEN avg(close) OVER w10 END AS sma_10,
      |    CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END AS sma_20,
      |    CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END +
      |      2.0 * CASE WHEN count(close) OVER w20 = 20 THEN stddev_samp(close) OVER w20 END AS bb_up,
      |    CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END -
      |      2.0 * CASE WHEN count(close) OVER w20 = 20 THEN stddev_samp(close) OVER w20 END AS bb_lo,
      |    CASE WHEN count(high - low) OVER w5 = 5 THEN avg(high - low) OVER w5 END AS vol_proxy
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w5  AS (w ROWS BETWEEN 4  PRECEDING AND CURRENT ROW),
      |         w10 AS (w ROWS BETWEEN 9  PRECEDING AND CURRENT ROW),
      |         w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |b1 AS (
      |  SELECT *, vol_proxy / nullif(CASE WHEN count(vol_proxy) OVER wp = 20
      |                                    THEN avg(vol_proxy) OVER wp END, 0) AS rng_ratio
      |  FROM b0
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         wp AS (w ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |b AS (
      |  SELECT user_id, bucket, close, sma_5, sma_10, sma_20, bb_up, bb_lo, rng_ratio,
      |    CASE WHEN sma_10 IS NOT NULL AND sma_20 IS NOT NULL THEN sma_10 > sma_20 END AS ma_above,
      |    lag(CASE WHEN sma_10 IS NOT NULL AND sma_20 IS NOT NULL THEN sma_10 > sma_20 END)
      |      OVER w AS prev_above,
      |    lag(close) OVER w AS prev_close,
      |    lag(bb_up) OVER w AS prev_bb_up, lag(bb_lo) OVER w AS prev_bb_lo,
      |    lag(sma_5) OVER w AS prev_sma5, lag(sma_20) OVER w AS prev_sma20,
      |    lag(close, 20) OVER w AS close_20,
      |    CASE WHEN count(close) OVER wp = 20 THEN stddev_samp(close) OVER wp END AS vol_prior
      |  FROM b1 WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |          wp AS (w ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, bucket,
      |  ma_above AND NOT prev_above AS trend_cross_up,
      |  NOT ma_above AND prev_above AS trend_cross_down,
      |  round(CASE WHEN abs(close - close_20) / nullif(vol_prior * 20, 0) IS NOT NULL
      |             THEN least(1.0, abs(close - close_20) / nullif(vol_prior * 20, 0))
      |        END, 6) + 0 AS trend_strength,
      |  close > bb_up AND prev_close <= prev_bb_up AND rng_ratio > 1.5 AS breakout_up,
      |  close < bb_lo AND prev_close >= prev_bb_lo AND rng_ratio > 1.5 AS breakout_down,
      |  CASE WHEN sma_5 > sma_20 AND NOT (prev_sma5 > prev_sma20) THEN 'buy'
      |       WHEN sma_5 < sma_20 AND NOT (prev_sma5 < prev_sma20) THEN 'sell' END
      |    AS sma_cross_signal
      |FROM b""".stripMargin

  // ---------------------------------------------------------------- W32
  /** W32 — candlestick patterns (`pattern_detection.py:102-286`): one
    * select of anatomy + lag-1/lag-2 comparisons, thresholds exactly as
    * the reference's detectors — doji body ≤ 10% of range (`:115`),
    * hammer 60/30/10 shadow-body-shadow ratios after a bearish candle
    * (`:150-153`), engulfing requires the larger body (`:189-192`),
    * morning/evening star = 30% star body + mid-recovery (`:244-276`).
    * `is_shooting_star` is the hammer mirror — the reference declares the
    * enum value (`:20`) but never wires a detector, so this is a
    * documented superset. */
  /** Memoized + localCheckpoint'ed per (session, dir): three registered
    * queries (w32 itself, f9, a13) consume this frame, and its plan is
    * DEEP — lag windows over the shared candle derivation — so each
    * consumer re-paid full Catalyst planning per action (the
    * cache-vs-checkpoint note in the verify skill). The checkpoint
    * truncates lineage to a LogicalRDD; consumers plan in microseconds.
    * Fit-sized (~10k candle rows at sf0.1). */
  def w32CandlePatterns(spark: SparkSession, dir: String): DataFrame =
    graft.scale.DirMemo.getOrCompute(spark, "w32_patterns", dir)(
      w32CandlePatternsImpl(spark, dir).localCheckpoint())

  private[graft] def w32CandlePatternsImpl(spark: SparkSession, dir: String): DataFrame = {
    val body = abs(col("close") - col("open"))
    val rng = col("high") - col("low")
    val upSh = col("high") - greatest(col("open"), col("close"))
    val loSh = least(col("open"), col("close")) - col("low")
    val bull = col("close") > col("open")
    val bear = col("close") < col("open")
    val base = Tables.candles(spark, dir)
      .withColumn("o1", lag(col("open"), 1).over(w))
      .withColumn("c1", lag(col("close"), 1).over(w))
      .withColumn("o2", lag(col("open"), 2).over(w))
      .withColumn("c2", lag(col("close"), 2).over(w))
    val body1 = abs(col("c1") - col("o1"))
    val bear1 = col("c1") < col("o1")
    val bull1 = col("c1") > col("o1")
    val body2 = abs(col("c2") - col("o2"))
    val bear2 = col("c2") < col("o2")
    val bull2 = col("c2") > col("o2")
    base.select(
      col("user_id"), col("bucket"),
      (rng > 0 && body <= lit(0.1) * rng).as("is_doji"),
      (rng > 0 && body > 0 && loSh >= lit(0.6) * rng &&
        body <= lit(0.3) * rng && upSh <= lit(0.1) * rng && bear1).as("is_hammer"),
      (rng > 0 && body > 0 && upSh >= lit(0.6) * rng &&
        body <= lit(0.3) * rng && loSh <= lit(0.1) * rng && bull1).as("is_shooting_star"),
      (bear1 && bull && col("open") < col("c1") && col("close") > col("o1") &&
        body > body1).as("is_bullish_engulfing"),
      (bull1 && bear && col("open") > col("c1") && col("close") < col("o1") &&
        body > body1).as("is_bearish_engulfing"),
      (bear2 && body1 < lit(0.3) * body2 && bull &&
        col("close") > (col("o2") + col("c2")) / 2).as("is_morning_star"),
      (bull2 && body1 < lit(0.3) * body2 && bear &&
        col("close") < (col("o2") + col("c2")) / 2).as("is_evening_star"),
      round(safeDiv(body, rng), 6).as("pattern_strength"))
  }

  /** W32 as a reusable CTE chain ending in a `patterns` relation — shared
    * with the A13 pattern-summary oracle so both engines summarize the
    * identical detection set. */
  val w32Cte: String = Tables.candlesSql +
    """, t AS (
      |  SELECT user_id, bucket, open, high, low, close,
      |    lag(open)  OVER w AS o1, lag(close)  OVER w AS c1,
      |    lag(open, 2) OVER w AS o2, lag(close, 2) OVER w AS c2
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |patterns AS (
      |  SELECT user_id, bucket,
      |    (high - low) > 0 AND abs(close - open) <= 0.1 * (high - low) AS is_doji,
      |    (high - low) > 0 AND abs(close - open) > 0
      |      AND (least(open, close) - low) >= 0.6 * (high - low)
      |      AND abs(close - open) <= 0.3 * (high - low)
      |      AND (high - greatest(open, close)) <= 0.1 * (high - low)
      |      AND c1 < o1 AS is_hammer,
      |    (high - low) > 0 AND abs(close - open) > 0
      |      AND (high - greatest(open, close)) >= 0.6 * (high - low)
      |      AND abs(close - open) <= 0.3 * (high - low)
      |      AND (least(open, close) - low) <= 0.1 * (high - low)
      |      AND c1 > o1 AS is_shooting_star,
      |    c1 < o1 AND close > open AND open < c1 AND close > o1
      |      AND abs(close - open) > abs(c1 - o1) AS is_bullish_engulfing,
      |    c1 > o1 AND close < open AND open > c1 AND close < o1
      |      AND abs(close - open) > abs(c1 - o1) AS is_bearish_engulfing,
      |    c2 < o2 AND abs(c1 - o1) < 0.3 * abs(c2 - o2) AND close > open
      |      AND close > (o2 + c2) / 2 AS is_morning_star,
      |    c2 > o2 AND abs(c1 - o1) < 0.3 * abs(c2 - o2) AND close < open
      |      AND close < (o2 + c2) / 2 AS is_evening_star,
      |    round(abs(close - open) / nullif(high - low, 0), 6) + 0 AS pattern_strength
      |  FROM t)""".stripMargin

  val w32Sql: String = w32Cte + "\nSELECT * FROM patterns"

  // ---------------------------------------------------------------- F9
  /** F9 — ordinal confidence filter on pattern signals
    * (`pattern_detection.py:484-504`): bucket strength into an ordinal
    * enum (low<medium<high<very_high), keep rank ≥ medium. The rank
    * mapping is a chained `when`, the filter an ordinal comparison —
    * never string comparison on the level names. */
  def f9ConfidenceFilter(spark: SparkSession, dir: String): DataFrame =
    w32CandlePatterns(spark, dir)
      .filter(col("is_doji") || col("is_hammer") || col("is_bullish_engulfing") ||
        col("is_bearish_engulfing"))
      .withColumn("confidence_rank",
        when(col("pattern_strength") >= 0.75, 4)
          .when(col("pattern_strength") >= 0.5, 3)
          .when(col("pattern_strength") >= 0.25, 2)
          .otherwise(1))
      .filter(col("confidence_rank") >= 2)
      .select(col("user_id"), col("bucket"), col("pattern_strength"), col("confidence_rank"))

  val f9Sql: String = w32Cte +
    """
      |SELECT user_id, bucket, pattern_strength,
      |       CAST(CASE WHEN pattern_strength >= 0.75 THEN 4
      |                 WHEN pattern_strength >= 0.5  THEN 3
      |                 WHEN pattern_strength >= 0.25 THEN 2
      |                 ELSE 1 END AS INT) AS confidence_rank
      |FROM patterns
      |WHERE (is_doji OR is_hammer OR is_bullish_engulfing OR is_bearish_engulfing)
      |  AND (CASE WHEN pattern_strength >= 0.75 THEN 4
      |            WHEN pattern_strength >= 0.5  THEN 3
      |            WHEN pattern_strength >= 0.25 THEN 2
      |            ELSE 1 END) >= 2""".stripMargin

  // ---------------------------------------------------------------- W36
  /** W36 — longest win/loss streaks via gaps-and-islands
    * (`backtesting_engine.py:441-467`): rn − rn_within_sign identifies
    * runs; two grouped aggregations, no Python loop. */
  def w36Streaks(spark: SparkSession, dir: String): DataFrame = {
    val signCol = when(diff(col("close"), w) > 0, 1)
      .when(diff(col("close"), w) < 0, -1)
      .when(diff(col("close"), w) === 0, 0)
    val base = Tables.candles(spark, dir)
      .withColumn("sign", signCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("sign").isNotNull)
      .withColumn("rn_sign", row_number().over(
        Window.partitionBy(col("user_id"), col("sign")).orderBy(col("bucket"))))
      .withColumn("island", col("rn") - col("rn_sign"))
    base.groupBy(col("user_id"), col("sign"), col("island"))
      .agg(count(lit(1)).as("run_length"))
      .groupBy(col("user_id"), col("sign"))
      .agg(max(col("run_length")).as("longest_streak"),
           count(lit(1)).as("n_runs"))
  }

  val w36Sql: String = Tables.candlesSql +
    """, s AS (
      |  SELECT user_id, bucket,
      |    CASE WHEN close - lag(close) OVER w > 0 THEN 1
      |         WHEN close - lag(close) OVER w < 0 THEN -1
      |         WHEN close - lag(close) OVER w = 0 THEN 0 END AS sign,
      |    row_number() OVER w AS rn
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |i AS (
      |  SELECT user_id, sign,
      |    rn - row_number() OVER (PARTITION BY user_id, sign ORDER BY bucket) AS island
      |  FROM s WHERE sign IS NOT NULL),
      |runs AS (
      |  SELECT user_id, sign, island, count(*) AS run_length
      |  FROM i GROUP BY user_id, sign, island)
      |SELECT user_id, sign, max(run_length) AS longest_streak, count(*) AS n_runs
      |FROM runs GROUP BY user_id, sign""".stripMargin

  // ---------------------------------------------------------------- W40
  /** W40 — daily floor-trader PIVOT POINTS (beyond the reference's
    * surface, the level system its support/resistance operator W29
    * approximates geometrically): yesterday's (H, L, C) per key fix
    * today's pivot P = (H+L+C)/3 and the R1/S1/R2/S2 ladder, applied to
    * every intraday candle with a position tag. The fit frame is
    * days × keys (tiny); the recurrence-free lag(1) over it plus ONE
    * equi-join on (key, day) back to the fact is the fit-then-apply
    * shape — at 100 TB the daily frame broadcasts and the corpus is
    * touched once, no window over the fact at all. */
  def w40PivotPoints(spark: SparkSession, dir: String): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val daily = graft.Tables.candles(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("bucket")).as("day"))
      .agg(max(col("high")).as("h"), min(col("low")).as("l"),
        max_by(col("close"), col("bucket")).as("c"))
    val piv = daily
      .withColumn("ph", lag(col("h"), 1).over(wd))
      .withColumn("pl", lag(col("l"), 1).over(wd))
      .withColumn("pc", lag(col("c"), 1).over(wd))
      .filter(col("ph").isNotNull)
      .withColumn("p", (col("ph") + col("pl") + col("pc")) / 3)
      .select(col("user_id"), col("day"),
        col("p"), (col("p") * 2 - col("pl")).as("r1"),
        (col("p") * 2 - col("ph")).as("s1"),
        (col("p") + (col("ph") - col("pl"))).as("r2"),
        (col("p") - (col("ph") - col("pl"))).as("s2"))
    val cd = graft.Tables.candles(spark, dir)
    cd.join(piv, cd("user_id") === piv("user_id") &&
        date_trunc("day", cd("bucket")) === piv("day"))
      .drop(piv("user_id"))
      .select(col("user_id"), col("bucket"), round(col("close"), 6).as("close"),
        round(col("p"), 6).as("pivot"),
        round(col("r1"), 6).as("r1"), round(col("s1"), 6).as("s1"),
        round(col("r2"), 6).as("r2"), round(col("s2"), 6).as("s2"),
        when(col("close") > col("r1"), "above_r1")
          .when(col("close") < col("s1"), "below_s1")
          .otherwise("inside").as("zone"))
  }

  val w40Sql: String = graft.Tables.candlesSql +
    """, dly AS (
      |  SELECT user_id, date_trunc('day', bucket) AS day,
      |         max(high) AS h, min(low) AS l, arg_max(close, bucket) AS c
      |  FROM candles GROUP BY 1, 2),
      |pp AS (
      |  SELECT user_id, day,
      |         lag(h) OVER wp AS ph, lag(l) OVER wp AS pl, lag(c) OVER wp AS pc
      |  FROM dly WINDOW wp AS (PARTITION BY user_id ORDER BY day)),
      |pv AS (
      |  SELECT user_id, day, (ph + pl + pc) / 3 AS p, ph, pl
      |  FROM pp WHERE ph IS NOT NULL)
      |SELECT c.user_id, c.bucket, round(c.close, 6) + 0 AS close,
      |  round(pv.p, 6) + 0 AS pivot,
      |  round(pv.p * 2 - pv.pl, 6) + 0 AS r1,
      |  round(pv.p * 2 - pv.ph, 6) + 0 AS s1,
      |  round(pv.p + (pv.ph - pv.pl), 6) + 0 AS r2,
      |  round(pv.p - (pv.ph - pv.pl), 6) + 0 AS s2,
      |  CASE WHEN c.close > pv.p * 2 - pv.pl THEN 'above_r1'
      |       WHEN c.close < pv.p * 2 - pv.ph THEN 'below_s1'
      |       ELSE 'inside' END AS zone
      |FROM candles c
      |JOIN pv ON c.user_id = pv.user_id AND date_trunc('day', c.bucket) = pv.day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w40_pivot_points"   -> (w40PivotPoints _),
    "w16_cci"            -> (w16Cci _),
    "w17_adx"            -> (w17Adx _),
    "w18_aroon"          -> (w18Aroon _),
    "w24_roll_stats"     -> (w24RollStats _),
    "w25_roll_corr"      -> (w25RollCorr _),
    "w26_ffill"          -> (w26Ffill _),
    "w27_regime"         -> (w27Regime _),
    "w29_support_resistance" -> (w29SupportResistance _),
    "w30_trend_signals"  -> (w30w31w33Signals _),
    "w32_candle_patterns" -> (w32CandlePatterns _),
    "f9_confidence_filter" -> (f9ConfidenceFilter _),
    "w36_streaks"        -> (w36Streaks _))

  def oracles: Map[String, String] = Map(
    "w40_pivot_points"   -> w40Sql,
    "w16_cci"            -> w16Sql,
    "w17_adx"            -> w17Sql,
    "w18_aroon"          -> w18Sql,
    "w24_roll_stats"     -> w24Sql,
    "w25_roll_corr"      -> w25Sql,
    "w26_ffill"          -> w26Sql,
    "w27_regime"         -> w27Sql,
    "w29_support_resistance" -> w29Sql,
    "w30_trend_signals"  -> w30Sql,
    "w32_candle_patterns" -> w32Sql,
    "f9_confidence_filter" -> f9Sql,
    "w36_streaks"        -> w36Sql)
}
