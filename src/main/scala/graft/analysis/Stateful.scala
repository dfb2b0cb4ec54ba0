package graft.analysis

import graft.Tables
import graft.features.Indicators._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Candle row for typed stateful scans. */
case class CandleRow(user_id: Long, bucket: java.sql.Timestamp,
                     open: Double, high: Double, low: Double, close: Double, volume: Long)

case class PsarRow(user_id: Long, bucket: java.sql.Timestamp, psar: Double, is_bull: Boolean)

/** One closed trade from the backtest fold. */
case class TradeRow(user_id: Long,
                    entry_time: java.sql.Timestamp, exit_time: java.sql.Timestamp,
                    entry_price: Double, exit_price: Double,
                    trade_type: String, size: Double, commission: Double,
                    pnl: Double, return_pct: Double)

case class SigRow(user_id: Long, bucket: java.sql.Timestamp, close: Double, signal: Int)

/** Sequential state machines — SURVEY §2.7 W19 (Parabolic SAR) and W34
  * (backtest execution), §7.4: inherently recursive, so not SQL windows.
  *
  * Implemented as `groupByKey(user).flatMapSortedGroups(bucket)`: Spark's
  * secondary sort hands each key's rows in time order to a streaming fold
  * with O(1) state per key — no per-group materialization, so a key's
  * series length is unbounded at scale. Parallelism = number of keys
  * (1500+ at sf0.1; at 100 TB this is the per-symbol/per-entity axis).
  * These have no SQL oracle (driver records rows-only); correctness is
  * pinned by specs against direct reference re-implementations.
  */
object Stateful {

  def candleDs(spark: SparkSession, dir: String): Dataset[CandleRow] = {
    import spark.implicits._
    Tables.candles(spark, dir).as[CandleRow]
  }

  // ---------------------------------------------------------------- W19
  /** Parabolic SAR (`advanced_feature_engineer.py:171-208`): trend flips
    * with accelerating factor; af 0.02 + 0.02 per new extreme, cap 0.2. */
  def psar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = candleDs(spark, dir)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[CandleRow]) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val first = rows.next()
          var bull = true
          var af = 0.02
          var ep = first.low // bull=true at init ⇒ ep = low[0]
          var prev = first.high // psar[0] = high[0]
          Iterator.single(PsarRow(uid, first.bucket, prev, bull)) ++
            rows.map { r =>
              var cur = prev + af * (ep - prev)
              if (bull) {
                if (r.low <= cur) {
                  bull = false; cur = ep; af = 0.02; ep = r.low
                } else if (r.high > ep) {
                  ep = r.high; af = math.min(af + 0.02, 0.2)
                }
              } else {
                if (r.high >= cur) {
                  bull = true; cur = ep; af = 0.02; ep = r.high
                } else if (r.low < ep) {
                  ep = r.low; af = math.min(af + 0.02, 0.2)
                }
              }
              prev = cur
              PsarRow(uid, r.bucket, cur, bull)
            }
        }
      }
    out.select(col("user_id"), col("bucket"), round(col("psar"), 6).as("psar"), col("is_bull"))
  }

  // ---------------------------------------------------------------- W33+W34
  /** SMA(10,20)-cross signals (W33, `backtesting_engine.py:186-202`) then
    * the sequential backtest fold (W34, `:284-379`): 10% sizing,
    * commission 1 bp per side, 5% stop-loss, exit on opposite signal,
    * force-close at series end. max_positions=1 (the engine default path:
    * one open trade per key). */
  def backtestTrades(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = W()
    val sig = Tables.candles(spark, dir)
      .withColumn("fast", sma(col("close"), 10, w))
      .withColumn("slow", sma(col("close"), 20, w))
      .withColumn("prev_fast", lag(col("fast"), 1).over(w))
      .withColumn("prev_slow", lag(col("slow"), 1).over(w))
      .withColumn("signal",
        when(col("fast") > col("slow") && col("prev_fast") <= col("prev_slow"), 1)
          .when(col("fast") < col("slow") && col("prev_fast") >= col("prev_slow"), -1)
          .otherwise(0))
      .select(col("user_id"), col("bucket"), col("close"), col("signal"))
    foldTrades(spark, sig)
  }

  /** W33 RSI-band strategy (`backtesting_engine.py:213-237`, simple
    * rolling RSI): crossing below 30 → buy, above 70 → sell. */
  def backtestTradesRsi(spark: SparkSession, dir: String): DataFrame = {
    val w = W()
    val base = Tables.candles(spark, dir)
      .withColumn("d", diff(col("close"), w))
      .withColumn("g", framed(gains(col("d")), 14, w)(avg(_).over(_)))
      .withColumn("l", framed(losses(col("d")), 14, w)(avg(_).over(_)))
      .withColumn("rsi",
        when(col("l") === 0, 100.0)
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("g") / col("l"))))
      .withColumn("prev_rsi", lag(col("rsi"), 1).over(w))
    val sig = base.withColumn("signal",
        when(col("rsi") < 30 && col("prev_rsi") >= 30, 1)
          .when(col("rsi") > 70 && col("prev_rsi") <= 70, -1)
          .otherwise(0))
      .select(col("user_id"), col("bucket"), col("close"), col("signal"))
    foldTrades(spark, sig)
  }

  /** W33 MACD-cross strategy (`backtesting_engine.py:248-274`): macd line
    * crossing its EMA-9 signal line, on the custom ewm aggregate. */
  def backtestTradesMacd(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val w = W()
    val grow = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    def ewm(c: org.apache.spark.sql.Column, span: Int) =
      graft.functions.GraftFunctions.ewmAvgSpan(c, span).over(grow)
    val base = Tables.candles(spark, dir)
      .withColumn("macd", ewm(col("close"), 12) - ewm(col("close"), 26))
      .withColumn("macd_sig", ewm(col("macd"), 9))
      .withColumn("prev_macd", lag(col("macd"), 1).over(w))
      .withColumn("prev_sig", lag(col("macd_sig"), 1).over(w))
    val sig = base.withColumn("signal",
        when(col("macd") > col("macd_sig") && col("prev_macd") <= col("prev_sig"), 1)
          .when(col("macd") < col("macd_sig") && col("prev_macd") >= col("prev_sig"), -1)
          .otherwise(0))
      .select(col("user_id"), col("bucket"), col("close"), col("signal"))
    foldTrades(spark, sig)
  }

  /** The W34 executor, strategy-agnostic (the reference runs every
    * strategy's signal series through the same fold). */
  private def foldTrades(spark: SparkSession, sig: DataFrame): DataFrame = {
    import spark.implicits._
    val initialCapital = 10000.0
    val commissionRate = 0.0001

    sig.as[SigRow]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[SigRow]) =>
        val trades = scala.collection.mutable.ArrayBuffer.empty[TradeRow]
        var capital = initialCapital
        // open trade state (max_positions = 1)
        var openEntryTime: java.sql.Timestamp = null
        var openEntryPrice = 0.0
        var openType = ""
        var openSize = 0.0
        var openCommission = 0.0
        var lastBucket: java.sql.Timestamp = null
        var lastClose = 0.0

        def close(exitTime: java.sql.Timestamp, exitPrice: Double): Unit = {
          val commission = openCommission + openSize * commissionRate
          val gross =
            if (openType == "buy") (exitPrice - openEntryPrice) * openSize
            else (openEntryPrice - exitPrice) * openSize
          val pnl = gross - commission
          val retPct =
            if (openType == "buy") (exitPrice - openEntryPrice) / openEntryPrice * 100
            else (openEntryPrice - exitPrice) / openEntryPrice * 100
          capital += pnl
          trades += TradeRow(uid, openEntryTime, exitTime, openEntryPrice, exitPrice,
            openType, openSize, commission, pnl, retPct)
          openEntryTime = null
        }

        rows.foreach { r =>
          lastBucket = r.bucket; lastClose = r.close
          // entry first (reference order: entry, then exits in same step);
          // solvency guard: a busted account (capital ≤ 0) opens nothing —
          // without this the 10% sizing goes negative and trades invert
          if (r.signal != 0 && openEntryTime == null && capital > 0) {
            val size = capital * 0.1
            val entryCommission = size * commissionRate
            openEntryTime = r.bucket; openEntryPrice = r.close
            openType = if (r.signal > 0) "buy" else "sell"
            openSize = size; openCommission = entryCommission
            capital -= entryCommission
          } else if (openEntryTime != null) {
            val opposite = (openType == "buy" && r.signal < 0) ||
              (openType == "sell" && r.signal > 0)
            val stopLoss = (openType == "buy" && r.close <= openEntryPrice * 0.95) ||
              (openType == "sell" && r.close >= openEntryPrice * 1.05)
            if (opposite || stopLoss) close(r.bucket, r.close)
          }
        }
        if (openEntryTime != null && lastBucket != null) close(lastBucket, lastClose)
        trades.iterator
      }
      .toDF()
      .select(col("user_id"), col("entry_time"), col("exit_time"),
        round(col("entry_price"), 6).as("entry_price"),
        round(col("exit_price"), 6).as("exit_price"),
        col("trade_type"),
        round(col("size"), 6).as("size"),
        round(col("commission"), 6).as("commission"),
        round(col("pnl"), 6).as("pnl"),
        round(col("return_pct"), 6).as("return_pct"))
  }

  // ---------------------------------------------------------------- A11
  /** The A11 metric layer (`backtesting_engine.py:79-160,441-467`) over
    * ANY trades frame with (user_id, entry_time, exit_time, pnl,
    * return_pct): equity curve → running peak → drawdown (W35);
    * same-sign islands → longest win/loss runs (W36 gaps-and-islands);
    * win rate / profit factor / sharpe as one hash aggregate. Reused by
    * [[backtestMetrics]] (fold-produced trades, rows-only) and
    * [[a11MetricsFixture]] (SQL-derivable trades — the oracle-checked
    * pin of this layer). */
  def metricsLayer(trades: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("exit_time"), col("entry_time"))
    val grow = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val curve = trades
      .withColumn("equity", lit(10000.0) + sum(col("pnl")).over(grow))
      .withColumn("peak", max(col("equity")).over(grow))
      .withColumn("dd", when(col("peak") > 0, (col("peak") - col("equity")) / col("peak")))
      .withColumn("win", (col("pnl") > 0).cast("int"))
      .withColumn("island",
        row_number().over(w) - row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), (col("pnl") > 0).cast("int"))
            .orderBy(col("exit_time"), col("entry_time"))))
    val streaks = curve.groupBy(col("user_id"), col("win"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("win") === 1, col("run_len"))).as("max_consec_wins"),
        max(when(col("win") === 0, col("run_len"))).as("max_consec_losses"))
    curve
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(when(col("pnl") > 0, 1).otherwise(0)).as("n_wins"),
        round(avg(when(col("pnl") > 0, 1.0).otherwise(0.0)), 6).as("win_rate"),
        round(sum(col("pnl")), 6).as("total_pnl"),
        round(coalesce(
          sum(when(col("pnl") > 0, col("pnl"))) / abs(sum(when(col("pnl") < 0, col("pnl")))),
          lit(null)), 6).as("profit_factor"),
        round(avg(col("return_pct")) / stddev(col("return_pct")), 6).as("sharpe_like"),
        round(max(col("dd")), 6).as("max_drawdown"))
      .join(streaks, Seq("user_id"), "left")
  }

  /** A11 over the fold-produced trades (rows-only; the metric layer
    * itself is oracle-pinned via [[a11MetricsFixture]]). */
  def backtestMetrics(spark: SparkSession, dir: String): DataFrame =
    metricsLayer(backtestTrades(spark, dir))

  /** A11 metric layer under the DuckDB oracle: trades are derived
    * deterministically in pure SQL — every 10th candle per user closes a
    * "trade" against the close 10 candles earlier — so both engines feed
    * the SAME trades through the SAME windowed metric chain; what the
    * oracle then checks is the drawdown/streak/sharpe algebra that the
    * fold-produced A11 shares via [[metricsLayer]]. */
  def a11MetricsFixture(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("bucket"))
    val trades = Tables.candles(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("entry_time", lag(col("bucket"), 10).over(w))
      .withColumn("entry_close", lag(col("close"), 10).over(w))
      .filter(col("rn") % 10 === 0 && col("entry_close").isNotNull)
      .select(col("user_id"), col("entry_time"), col("bucket").as("exit_time"),
        round(col("close") - col("entry_close"), 6).as("pnl"),
        round((col("close") - col("entry_close")) / col("entry_close"), 6).as("return_pct"))
    metricsLayer(trades)
  }

  val a11MetricsFixtureSql: String = Tables.candlesSql +
    """, numbered AS (
      |  SELECT user_id, bucket, close,
      |         row_number() OVER w AS rn,
      |         lag(bucket, 10) OVER w AS entry_time,
      |         lag(close, 10) OVER w AS entry_close
      |  FROM candles
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |trades AS (
      |  SELECT user_id, entry_time, bucket AS exit_time,
      |         round(close - entry_close, 6) + 0 AS pnl,
      |         round((close - entry_close) / entry_close, 6) + 0 AS return_pct
      |  FROM numbered
      |  WHERE rn % 10 = 0 AND entry_close IS NOT NULL),
      |curve0 AS (
      |  SELECT user_id, exit_time, entry_time, pnl, return_pct,
      |         10000.0 + sum(pnl) OVER wg AS equity,
      |         CASE WHEN pnl > 0 THEN 1 ELSE 0 END AS win,
      |         row_number() OVER w -
      |           row_number() OVER (PARTITION BY user_id, CASE WHEN pnl > 0 THEN 1 ELSE 0 END
      |                              ORDER BY exit_time, entry_time) AS island
      |  FROM trades
      |  WINDOW w AS (PARTITION BY user_id ORDER BY exit_time, entry_time),
      |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |curve1 AS (
      |  SELECT *, max(equity) OVER (PARTITION BY user_id ORDER BY exit_time, entry_time
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM curve0),
      |curve2 AS (
      |  SELECT *, CASE WHEN peak > 0 THEN (peak - equity) / peak END AS dd FROM curve1),
      |streaks AS (
      |  SELECT user_id,
      |         max(CASE WHEN win = 1 THEN run_len END) AS max_consec_wins,
      |         max(CASE WHEN win = 0 THEN run_len END) AS max_consec_losses
      |  FROM (SELECT user_id, win, island, count(*) AS run_len
      |        FROM curve2 GROUP BY 1, 2, 3)
      |  GROUP BY user_id),
      |agg AS (
      |  SELECT user_id,
      |         count(*) AS n_trades,
      |         CAST(sum(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wins,
      |         round(avg(CASE WHEN pnl > 0 THEN 1.0 ELSE 0.0 END), 6) + 0 AS win_rate,
      |         round(sum(pnl), 6) + 0 AS total_pnl,
      |         round(sum(CASE WHEN pnl > 0 THEN pnl END) /
      |               abs(sum(CASE WHEN pnl < 0 THEN pnl END)), 6) + 0 AS profit_factor,
      |         round(avg(return_pct) / stddev_samp(return_pct), 6) + 0 AS sharpe_like,
      |         round(max(dd), 6) + 0 AS max_drawdown
      |  FROM curve2 GROUP BY user_id)
      |SELECT a.*, s.max_consec_wins, s.max_consec_losses
      |FROM agg a LEFT JOIN streaks s USING (user_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w19_psar"          -> (psar _),
    "w34_backtest"      -> (backtestTrades _),
    "w34_backtest_rsi"  -> (backtestTradesRsi _),
    "w34_backtest_macd" -> (backtestTradesMacd _),
    "a11_backtest_metrics" -> (backtestMetrics _),
    "a11_metrics_fixture"  -> (a11MetricsFixture _))

  /** The fold queries are sequential state machines with no SQL oracle
    * (driver rows-only check); the shared A11 metric layer is pinned by
    * the fixture oracle. */
  def oracles: Map[String, String] = Map(
    "a11_metrics_fixture"  -> a11MetricsFixtureSql)
}
