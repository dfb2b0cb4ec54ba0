package graft.operators

import graft.Tables
import graft.features.Indicators._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EMA-family operators — SURVEY §2.7 W4–W6, W8 (ewm variant), built on
  * the custom Catalyst aggregate [[graft.functions.EwmAvg]].
  *
  * Oracle note: DuckDB has no ewm builtin, so the oracles compute the
  * identical adjust=True weighted mean via the normalized-weight identity
  * `ewm_t = Σ x_i·u_i / Σ u_i` with `u_i = (1−α)^(−i)` over the growing
  * frame. That form overflows on long series (fine at test scale, ≤ ~70
  * rows per key); the engine-side recurrence in EwmAvg is the scale-safe
  * form (SURVEY §7.5 — EMA semantic fidelity).
  */
object EmaFamily {

  private val w = W()
  private def grow = w.rowsBetween(Window.unboundedPreceding, 0)

  private def ewmSpan(c: Column, span: Int): Column =
    GraftFunctions.ewmAvgSpan(c, span).over(grow)

  /** SQL fragment: ewm(span) of column `x` named `out`, given a layer
    * that already computed `pos_x = count(x) over growing` and weights. */
  private def alphaOf(span: Int): String = s"(2.0 / ${span + 1}.0)"

  // ---------------------------------------------------------------- W4
  /** W4 — EMA 12/26 (`feature_engineer.py:105-113`). */
  def w4Ema(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.candles(spark, dir).select(
      col("user_id"), col("bucket"),
      round(ewmSpan(col("close"), 12), 6).as("ema_12"),
      round(ewmSpan(col("close"), 26), 6).as("ema_26"))
  }

  val w4Sql: String = Tables.candlesSql +
    s""", u AS (
       |  SELECT user_id, bucket, close,
       |    pow(1.0 / (1.0 - ${alphaOf(12)}), CAST(count(close) OVER wg AS DOUBLE)) AS u12,
       |    pow(1.0 / (1.0 - ${alphaOf(26)}), CAST(count(close) OVER wg AS DOUBLE)) AS u26
       |  FROM candles
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, bucket,
       |  round(sum(close * u12) OVER wg / sum(u12) OVER wg, 6) + 0 AS ema_12,
       |  round(sum(close * u26) OVER wg / sum(u26) OVER wg, 6) + 0 AS ema_26
       |FROM u
       |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |       wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W6
  /** W6 — MACD(12,26,9) (`feature_engineer.py:137-161`): macd line, EMA-9
    * signal (an ewm over a derived series — nested window), histogram. */
  def w6Macd(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val base = Tables.candles(spark, dir)
      .withColumn("macd", ewmSpan(col("close"), 12) - ewmSpan(col("close"), 26))
      .withColumn("macd_signal", ewmSpan(col("macd"), 9))
    base.select(
      col("user_id"), col("bucket"),
      round(col("macd"), 6).as("macd"),
      round(col("macd_signal"), 6).as("macd_signal"),
      round(col("macd") - col("macd_signal"), 6).as("macd_histogram"))
  }

  val w6Sql: String = Tables.candlesSql +
    s""", u AS (
       |  SELECT user_id, bucket, close,
       |    pow(1.0 / (1.0 - ${alphaOf(12)}), CAST(count(close) OVER wg AS DOUBLE)) AS u12,
       |    pow(1.0 / (1.0 - ${alphaOf(26)}), CAST(count(close) OVER wg AS DOUBLE)) AS u26
       |  FROM candles
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |m AS (
       |  SELECT user_id, bucket,
       |    sum(close * u12) OVER wg / sum(u12) OVER wg -
       |    sum(close * u26) OVER wg / sum(u26) OVER wg AS macd
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |s AS (
       |  SELECT user_id, bucket, macd,
       |    pow(1.0 / (1.0 - ${alphaOf(9)}), CAST(count(macd) OVER wg AS DOUBLE)) AS u9
       |  FROM m
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, bucket,
       |  round(macd, 6) + 0 AS macd,
       |  round(sum(macd * u9) OVER wg / sum(u9) OVER wg, 6) + 0 AS macd_signal,
       |  round(macd - sum(macd * u9) OVER wg / sum(u9) OVER wg, 6) + 0 AS macd_histogram
       |FROM s
       |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |       wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W5 (ewm)
  /** W5 — RSI-14, reference's primary ewm form
    * (`feature_engineer.py:115-135`): ewm(span=14) of gains/losses. The
    * gains series has exactly one leading null (the first diff), which
    * EwmAvg skips — pandas-identical for leading nulls. */
  def w5RsiEwm(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val base = Tables.candles(spark, dir)
      .withColumn("d", diff(col("close"), w))
      .withColumn("g", ewmSpan(gains(col("d")), 14))
      .withColumn("l", ewmSpan(losses(col("d")), 14))
    base.select(
      col("user_id"), col("bucket"),
      round(when(col("g").isNull || col("l").isNull, lit(null))
        .when(col("l") === 0 && col("g") === 0, lit(null))
        .when(col("l") === 0, lit(100.0))
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("g") / col("l"))), 6)
        .as("rsi_ewm_14"))
  }

  val w5EwmSql: String = Tables.candlesSql +
    s""", d1 AS (
       |  SELECT user_id, bucket,
       |    close - lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS d
       |  FROM candles),
       |d2 AS (
       |  SELECT user_id, bucket,
       |    CASE WHEN d IS NOT NULL THEN CASE WHEN d > 0 THEN d  ELSE 0.0 END END AS gain,
       |    CASE WHEN d IS NOT NULL THEN CASE WHEN d < 0 THEN -d ELSE 0.0 END END AS loss
       |  FROM d1),
       |u AS (
       |  SELECT user_id, bucket, gain, loss,
       |    CASE WHEN gain IS NOT NULL
       |         THEN pow(1.0 / (1.0 - ${alphaOf(14)}), CAST(count(gain) OVER wg AS DOUBLE)) END AS ug,
       |    CASE WHEN loss IS NOT NULL
       |         THEN pow(1.0 / (1.0 - ${alphaOf(14)}), CAST(count(loss) OVER wg AS DOUBLE)) END AS ul
       |  FROM d2
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |e AS (
       |  SELECT user_id, bucket,
       |    sum(gain * ug) OVER wg / sum(ug) OVER wg AS g,
       |    sum(loss * ul) OVER wg / sum(ul) OVER wg AS l
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, bucket,
       |  round(CASE WHEN g IS NULL OR l IS NULL THEN NULL
       |             WHEN l = 0 AND g = 0 THEN NULL
       |             WHEN l = 0 THEN 100.0
       |             ELSE 100.0 - 100.0 / (1.0 + g / l) END, 6) + 0 AS rsi_ewm_14
       |FROM e""".stripMargin

  // ---------------------------------------------------------------- W8 (ewm)
  /** W8 — ATR-14, reference's primary ewm form
    * (`feature_engineer.py:189-204`): ewm(span=14) of true range (one
    * leading null from the lagged close). */
  def w8AtrEwm(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val base = Tables.candles(spark, dir)
      .withColumn("tr", trueRange(col("high"), col("low"), col("close"), w))
    base.select(
      col("user_id"), col("bucket"),
      round(ewmSpan(col("tr"), 14), 6).as("atr_ewm_14"))
  }

  val w8EwmSql: String = Tables.candlesSql +
    s""", t1 AS (
       |  SELECT user_id, bucket, high, low, close,
       |    lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
       |  FROM candles),
       |t2 AS (
       |  SELECT user_id, bucket,
       |    CASE WHEN pc IS NOT NULL
       |         THEN greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
       |  FROM t1),
       |u AS (
       |  SELECT user_id, bucket, tr,
       |    CASE WHEN tr IS NOT NULL
       |         THEN pow(1.0 / (1.0 - ${alphaOf(14)}), CAST(count(tr) OVER wg AS DOUBLE)) END AS ut
       |  FROM t2
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, bucket,
       |  round(sum(tr * ut) OVER wg / sum(ut) OVER wg, 6) + 0 AS atr_ewm_14
       |FROM u
       |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |       wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w4_ema"      -> (w4Ema _),
    "w6_macd"     -> (w6Macd _),
    "w5_rsi_ewm"  -> (w5RsiEwm _),
    "w8_atr_ewm"  -> (w8AtrEwm _))

  def oracles: Map[String, String] = Map(
    "w4_ema"      -> w4Sql,
    "w6_macd"     -> w6Sql,
    "w5_rsi_ewm"  -> w5EwmSql,
    "w8_atr_ewm"  -> w8EwmSql)
}
