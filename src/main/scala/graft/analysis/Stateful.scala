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

case class HaRow(user_id: Long, bucket: java.sql.Timestamp,
    ha_open: Double, ha_high: Double, ha_low: Double, ha_close: Double, is_bull: Boolean)

case class SigRow(user_id: Long, bucket: java.sql.Timestamp, close: Double, signal: Int)
case class RateRow(event_type: String, day: java.sql.Timestamp, n: Long, z: Double)
case class CusumRow(event_type: String, day: java.sql.Timestamp,
    n_events: Long, z: Double, cusum: Double, alarm: Boolean)

/** Sequential state machines — SURVEY §2.7 W19 (Parabolic SAR) and W34
  * (backtest execution), §7.4: inherently recursive, so not SQL windows.
  *
  * Implemented as `groupByKey(user).flatMapSortedGroups(bucket)`: Spark's
  * secondary sort hands each key's rows in time order to a streaming fold
  * with O(1) state per key — no per-group materialization, so a key's
  * series length is unbounded at scale. Parallelism = number of keys
  * (1500+ at sf0.1; at 100 TB this is the per-symbol/per-entity axis).
  *
  * Oracles: the folds ARE expressible in DuckDB as recursive CTEs that
  * advance every key one row per iteration in lockstep (depth = longest
  * per-key series, not total rows). The SQL carries the same state tuple
  * through the same arithmetic expressions in the same order, so the
  * doubles are bit-identical, not merely close. Correctness is also
  * pinned by specs against direct reference re-implementations.
  */
object Stateful {

  def candleDs(spark: SparkSession, dir: String): Dataset[CandleRow] = {
    import spark.implicits._
    Tables.candles(spark, dir).as[CandleRow]
  }

  // ---------------------------------------------------------------- W19
  /** PSAR fold state: trend direction, acceleration factor, extreme
    * point, and the SAR emitted for the current row. Factored out of
    * the fold (the zzStep/renkoStep pattern) so TransitionPropSpec can
    * sample adversarial candle series against the pure transition. */
  private[graft] final case class PsarCore(bull: Boolean, af: Double,
      ep: Double, sar: Double)

  /** Seed state from the first candle: bull, af 0.02, ep = low[0],
    * psar[0] = high[0]. */
  private[graft] def psarInit(high: Double, low: Double): PsarCore =
    PsarCore(bull = true, af = 0.02, ep = low, sar = high)

  /** One PSAR transition; the emitted SAR for the row is the returned
    * state's `sar`. Arithmetic order matches [[psarSql]] exactly. */
  private[graft] def psarStep(st: PsarCore, high: Double, low: Double): PsarCore = {
    var bull = st.bull; var af = st.af; var ep = st.ep
    var cur = st.sar + af * (ep - st.sar)
    if (bull) {
      if (low <= cur) {
        bull = false; cur = ep; af = 0.02; ep = low
      } else if (high > ep) {
        ep = high; af = math.min(af + 0.02, 0.2)
      }
    } else {
      if (high >= cur) {
        bull = true; cur = ep; af = 0.02; ep = high
      } else if (low < ep) {
        ep = low; af = math.min(af + 0.02, 0.2)
      }
    }
    PsarCore(bull, af, ep, cur)
  }

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
          var core = psarInit(first.high, first.low)
          Iterator.single(PsarRow(uid, first.bucket, core.sar, core.bull)) ++
            rows.map { r =>
              core = psarStep(core, r.high, r.low)
              PsarRow(uid, r.bucket, core.sar, core.bull)
            }
        }
      }
    out.select(col("user_id"), col("bucket"), round(col("psar"), 6).as("psar"), col("is_bull"))
  }

  /** `Tables.candlesSql` reopened as a recursive WITH (the recursive
    * member comes later in the CTE list; RECURSIVE must be declared up
    * front). NB: under WITH RECURSIVE DuckDB scopes WINDOW names across
    * ALL CTEs in the list, so every window alias below is unique. */
  private val recursiveCandles: String =
    "WITH RECURSIVE " + graft.Tables.candlesSql.stripPrefix("WITH ")

  /** W19 oracle: the SAR recurrence as a recursive CTE — state
    * (psar, bull, af, ep) steps through the same branch structure and
    * arithmetic as the fold above, all keys in lockstep. */
  val psarSql: String = {
    val raw = "(p.psar + p.af * (p.ep - p.psar))"
    s"""$recursiveCandles,
       |c AS (SELECT user_id, bucket, high, low,
       |        row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn
       |      FROM candles),
       |p(user_id, rn, bucket, psar, bull, af, ep) AS (
       |  SELECT user_id, rn, bucket, high, TRUE, 0.02::DOUBLE, low FROM c WHERE rn = 1
       |  UNION ALL
       |  SELECT c.user_id, c.rn, c.bucket,
       |    CASE WHEN p.bull THEN CASE WHEN c.low <= $raw THEN p.ep ELSE $raw END
       |         ELSE CASE WHEN c.high >= $raw THEN p.ep ELSE $raw END END,
       |    CASE WHEN p.bull THEN c.low > $raw ELSE c.high >= $raw END,
       |    CASE WHEN p.bull THEN
       |           CASE WHEN c.low <= $raw THEN 0.02::DOUBLE
       |                WHEN c.high > p.ep THEN least(p.af + 0.02, 0.2::DOUBLE)
       |                ELSE p.af END
       |         ELSE
       |           CASE WHEN c.high >= $raw THEN 0.02::DOUBLE
       |                WHEN c.low < p.ep THEN least(p.af + 0.02, 0.2::DOUBLE)
       |                ELSE p.af END END,
       |    CASE WHEN p.bull THEN
       |           CASE WHEN c.low <= $raw THEN c.low
       |                WHEN c.high > p.ep THEN c.high
       |                ELSE p.ep END
       |         ELSE
       |           CASE WHEN c.high >= $raw THEN c.high
       |                WHEN c.low < p.ep THEN c.low
       |                ELSE p.ep END END
       |  FROM p JOIN c ON c.user_id = p.user_id AND c.rn = p.rn + 1
       |)
       |SELECT user_id, bucket, round(psar, 6) + 0 AS psar, bull AS is_bull FROM p""".stripMargin
  }

  // ---------------------------------------------------------------- W33+W34
  /** SMA(10,20)-cross signals (W33, `backtesting_engine.py:186-202`) then
    * the sequential backtest fold (W34, `:284-379`): 10% sizing,
    * commission 1 bp per side, 5% stop-loss, exit on opposite signal,
    * force-close at series end. max_positions=1 (the engine default path:
    * one open trade per key). */
  /** Memoized per (session, dir): the SMA-cross trade blotter is read
    * by the registered `w34_backtest` query AND [[backtestMetrics]]
    * (A11) — without the memo the metrics layer re-pays the signal
    * windows and the whole sequential fold. Bench's warm pass runs
    * [[backtestTradesImpl]] for `w34_backtest` (see
    * `SparkEntry.benchImpls`), so the fold's real cost stays measured;
    * A11 reading the materialized blotter is the production shape (the
    * reference persists trades, then computes metrics over them). */
  def backtestTrades(spark: SparkSession, dir: String): DataFrame =
    graft.scale.DirMemo.getOrCompute(spark, "w34_trades", dir)(
      backtestTradesImpl(spark, dir).localCheckpoint())

  private[graft] def backtestTradesImpl(spark: SparkSession, dir: String): DataFrame = {
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

  /** Open-position half of the backtest state (max_positions = 1). */
  private[graft] final case class BtOpen(entryTime: java.sql.Timestamp,
      entryPrice: Double, tradeType: String, size: Double, commission: Double)

  /** Backtest fold state: account capital + the open trade, if any.
    * Factored out (the zzStep/psarStep pattern) so TransitionPropSpec
    * can drive the trade lifecycle with adversarial signal series. */
  private[graft] final case class BtCore(capital: Double, open: Option[BtOpen])

  private[graft] val btInit: BtCore = BtCore(10000.0, None)
  private val commissionRate = 0.0001

  /** A closed trade, key-agnostic; the fold maps it onto [[TradeRow]]. */
  private[graft] final case class BtTrade(entryTime: java.sql.Timestamp,
      exitTime: java.sql.Timestamp, entryPrice: Double, exitPrice: Double,
      tradeType: String, size: Double, commission: Double,
      pnl: Double, returnPct: Double)

  private def btClose(st: BtCore, o: BtOpen,
      exitTime: java.sql.Timestamp, exitPrice: Double): (BtCore, Some[BtTrade]) = {
    val commission = o.commission + o.size * commissionRate
    val gross =
      if (o.tradeType == "buy") (exitPrice - o.entryPrice) * o.size
      else (o.entryPrice - exitPrice) * o.size
    val pnl = gross - commission
    val retPct =
      if (o.tradeType == "buy") (exitPrice - o.entryPrice) / o.entryPrice * 100
      else (o.entryPrice - exitPrice) / o.entryPrice * 100
    (BtCore(st.capital + pnl, None),
      Some(BtTrade(o.entryTime, exitTime, o.entryPrice, exitPrice,
        o.tradeType, o.size, commission, pnl, retPct)))
  }

  /** One backtest transition (reference `backtesting_engine.py:284-379`):
    * entry first (10% sizing, 1 bp commission per side, solvency guard —
    * a busted account opens nothing, else negative sizing inverts
    * trades), ELSE exit on opposite signal or the 5% stop-loss. An
    * entry row never also exits; an exit row never also enters. */
  private[graft] def btStep(st: BtCore, signal: Int,
      bucket: java.sql.Timestamp, close: Double): (BtCore, Option[BtTrade]) =
    st.open match {
      case None if signal != 0 && st.capital > 0 =>
        val size = st.capital * 0.1
        val entryCommission = size * commissionRate
        (BtCore(st.capital - entryCommission,
          Some(BtOpen(bucket, close, if (signal > 0) "buy" else "sell",
            size, entryCommission))), None)
      case Some(o) =>
        val opposite = (o.tradeType == "buy" && signal < 0) ||
          (o.tradeType == "sell" && signal > 0)
        val stopLoss = (o.tradeType == "buy" && close <= o.entryPrice * 0.95) ||
          (o.tradeType == "sell" && close >= o.entryPrice * 1.05)
        if (opposite || stopLoss) btClose(st, o, bucket, close)
        else (st, None)
      case None => (st, None)
    }

  /** Force-close at series end. */
  private[graft] def btFinish(st: BtCore,
      lastBucket: java.sql.Timestamp, lastClose: Double): (BtCore, Option[BtTrade]) =
    st.open match {
      case Some(o) if lastBucket != null => btClose(st, o, lastBucket, lastClose)
      case _ => (st, None)
    }

  /** The W34 executor, strategy-agnostic (the reference runs every
    * strategy's signal series through the same fold). */
  private def foldTrades(spark: SparkSession, sig: DataFrame): DataFrame = {
    import spark.implicits._
    sig.as[SigRow]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[SigRow]) =>
        val trades = scala.collection.mutable.ArrayBuffer.empty[TradeRow]
        var core = btInit
        var lastBucket: java.sql.Timestamp = null
        var lastClose = 0.0
        def emit(t: Option[BtTrade]): Unit = t.foreach { bt =>
          trades += TradeRow(uid, bt.entryTime, bt.exitTime, bt.entryPrice,
            bt.exitPrice, bt.tradeType, bt.size, bt.commission, bt.pnl, bt.returnPct)
        }
        rows.foreach { r =>
          lastBucket = r.bucket; lastClose = r.close
          val (nc, t) = btStep(core, r.signal, r.bucket, r.close)
          core = nc; emit(t)
        }
        val (_, t) = btFinish(core, lastBucket, lastClose)
        emit(t)
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

  // ------------------------------------------------------- W34 fold oracle
  /** The W34 executor as recursive-CTE SQL, strategy-agnostic like
    * [[foldTrades]]: `sigCtes` must end with a CTE
    * `sig(user_id, bucket, close, signal)`. The state tuple mirrors the
    * fold's mutable variables; entry/exit arithmetic keeps the fold's
    * exact operation order (size before commission, gross before pnl) so
    * capital compounds bit-identically. Ends with `alltr` (emitted +
    * force-closed trades, unrounded) so consumers choose their own
    * projection. */
  private def foldTradesCtes(sigCtes: String): String = {
    val ent = "(s.signal <> 0 AND p.o_time IS NULL AND p.capital > 0)"
    val opp = "((p.o_type = 'buy' AND s.signal < 0) OR (p.o_type = 'sell' AND s.signal > 0))"
    val stop = "((p.o_type = 'buy' AND s.close <= p.o_price * 0.95) OR " +
      "(p.o_type = 'sell' AND s.close >= p.o_price * 1.05))"
    val ext = s"(p.o_time IS NOT NULL AND ($opp OR $stop))"
    val comm = "(p.o_comm + p.o_size * 0.0001)"
    val gross = "(CASE WHEN p.o_type = 'buy' THEN (s.close - p.o_price) * p.o_size " +
      "ELSE (p.o_price - s.close) * p.o_size END)"
    val pnl = s"($gross - $comm)"
    val ret = "(CASE WHEN p.o_type = 'buy' THEN (s.close - p.o_price) / p.o_price * 100.0 " +
      "ELSE (p.o_price - s.close) / p.o_price * 100.0 END)"
    val fcomm = "(o_comm + o_size * 0.0001)"
    val fgross = "(CASE WHEN o_type = 'buy' THEN (last_close - o_price) * o_size " +
      "ELSE (o_price - last_close) * o_size END)"
    val fret = "(CASE WHEN o_type = 'buy' THEN (last_close - o_price) / o_price * 100.0 " +
      "ELSE (o_price - last_close) / o_price * 100.0 END)"
    s"""$recursiveCandles,
       |$sigCtes,
       |sr AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn FROM sig),
       |p(user_id, rn, capital, o_time, o_price, o_type, o_size, o_comm, last_bucket, last_close,
       |  t_emit, t_entry_time, t_exit_time, t_entry_price, t_exit_price, t_type, t_size, t_comm, t_pnl, t_ret) AS (
       |  SELECT user_id, 0, 10000.0::DOUBLE, NULL::TIMESTAMP, 0.0::DOUBLE, '', 0.0::DOUBLE, 0.0::DOUBLE,
       |         NULL::TIMESTAMP, 0.0::DOUBLE, FALSE, NULL::TIMESTAMP, NULL::TIMESTAMP, NULL::DOUBLE,
       |         NULL::DOUBLE, NULL::VARCHAR, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE
       |  FROM (SELECT DISTINCT user_id FROM sr)
       |  UNION ALL
       |  SELECT s.user_id, s.rn,
       |    CASE WHEN $ent THEN p.capital - (p.capital * 0.1) * 0.0001
       |         WHEN $ext THEN p.capital + $pnl ELSE p.capital END,
       |    CASE WHEN $ent THEN s.bucket WHEN $ext THEN NULL ELSE p.o_time END,
       |    CASE WHEN $ent THEN s.close WHEN $ext THEN 0.0 ELSE p.o_price END,
       |    CASE WHEN $ent THEN (CASE WHEN s.signal > 0 THEN 'buy' ELSE 'sell' END)
       |         WHEN $ext THEN '' ELSE p.o_type END,
       |    CASE WHEN $ent THEN p.capital * 0.1 WHEN $ext THEN 0.0 ELSE p.o_size END,
       |    CASE WHEN $ent THEN (p.capital * 0.1) * 0.0001 WHEN $ext THEN 0.0 ELSE p.o_comm END,
       |    s.bucket, s.close,
       |    $ext,
       |    CASE WHEN $ext THEN p.o_time END,
       |    CASE WHEN $ext THEN s.bucket END,
       |    CASE WHEN $ext THEN p.o_price END,
       |    CASE WHEN $ext THEN s.close END,
       |    CASE WHEN $ext THEN p.o_type END,
       |    CASE WHEN $ext THEN p.o_size END,
       |    CASE WHEN $ext THEN $comm END,
       |    CASE WHEN $ext THEN $pnl END,
       |    CASE WHEN $ext THEN $ret END
       |  FROM p JOIN sr s ON s.user_id = p.user_id AND s.rn = p.rn + 1),
       |emitted AS (
       |  SELECT user_id, t_entry_time AS entry_time, t_exit_time AS exit_time,
       |         t_entry_price AS entry_price, t_exit_price AS exit_price, t_type AS trade_type,
       |         t_size AS size, t_comm AS commission, t_pnl AS pnl, t_ret AS return_pct
       |  FROM p WHERE t_emit),
       |fin AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS frk FROM p) WHERE frk = 1),
       |forced AS (
       |  SELECT user_id, o_time AS entry_time, last_bucket AS exit_time, o_price AS entry_price,
       |         last_close AS exit_price, o_type AS trade_type, o_size AS size,
       |         $fcomm AS commission, ($fgross - $fcomm) AS pnl, $fret AS return_pct
       |  FROM fin WHERE o_time IS NOT NULL),
       |alltr AS (SELECT * FROM emitted UNION ALL SELECT * FROM forced)""".stripMargin
  }

  private val foldFinalSelect: String =
    """SELECT user_id, entry_time, exit_time, round(entry_price, 6) + 0 AS entry_price,
      |       round(exit_price, 6) + 0 AS exit_price, trade_type, round(size, 6) + 0 AS size,
      |       round(commission, 6) + 0 AS commission, round(pnl, 6) + 0 AS pnl,
      |       round(return_pct, 6) + 0 AS return_pct
      |FROM alltr""".stripMargin

  /** SMA(10,20)-cross signal CTEs (mirrors [[backtestTrades]]'s layer). */
  private val smaSigCtes: String =
    """f AS (
      |  SELECT user_id, bucket, close,
      |         CASE WHEN count(close) OVER sw10 = 10 THEN avg(close) OVER sw10 END AS fast,
      |         CASE WHEN count(close) OVER sw20 = 20 THEN avg(close) OVER sw20 END AS slow
      |  FROM candles
      |  WINDOW swa AS (PARTITION BY user_id ORDER BY bucket),
      |         sw10 AS (swa ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
      |         sw20 AS (swa ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |sig AS (
      |  SELECT user_id, bucket, close,
      |         CASE WHEN fast > slow AND lag(fast) OVER swb <= lag(slow) OVER swb THEN 1
      |              WHEN fast < slow AND lag(fast) OVER swb >= lag(slow) OVER swb THEN -1
      |              ELSE 0 END AS signal
      |  FROM f WINDOW swb AS (PARTITION BY user_id ORDER BY bucket))""".stripMargin

  /** RSI(14) band-cross signal CTEs (mirrors [[backtestTradesRsi]]). */
  private val rsiSigCtes: String =
    """dd AS (
      |  SELECT user_id, bucket, close, close - lag(close) OVER rwa AS d
      |  FROM candles WINDOW rwa AS (PARTITION BY user_id ORDER BY bucket)),
      |gl AS (
      |  SELECT user_id, bucket, close,
      |         CASE WHEN count(g) OVER rw14 = 14 THEN avg(g) OVER rw14 END AS g,
      |         CASE WHEN count(l) OVER rw14 = 14 THEN avg(l) OVER rw14 END AS l
      |  FROM (SELECT *,
      |          CASE WHEN d IS NOT NULL THEN (CASE WHEN d > 0 THEN d ELSE 0.0 END) END AS g,
      |          CASE WHEN d IS NOT NULL THEN (CASE WHEN d < 0 THEN -d ELSE 0.0 END) END AS l
      |        FROM dd)
      |  WINDOW rwb AS (PARTITION BY user_id ORDER BY bucket),
      |         rw14 AS (rwb ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      |rr AS (
      |  SELECT user_id, bucket, close,
      |         CASE WHEN l = 0 THEN 100.0 ELSE 100.0 - 100.0 / (1.0 + g / l) END AS rsi
      |  FROM gl),
      |sig AS (
      |  SELECT user_id, bucket, close,
      |         CASE WHEN rsi < 30 AND lag(rsi) OVER rwc >= 30 THEN 1
      |              WHEN rsi > 70 AND lag(rsi) OVER rwc <= 70 THEN -1
      |              ELSE 0 END AS signal
      |  FROM rr WINDOW rwc AS (PARTITION BY user_id ORDER BY bucket))""".stripMargin

  /** MACD(12,26,9) line-cross signal CTEs (mirrors
    * [[backtestTradesMacd]]; the naive normalized-weight ewm form — fine
    * at per-key series lengths, see [[graft.operators.EmaFamily]]). */
  private val macdSigCtes: String =
    """mu AS (
      |  SELECT user_id, bucket, close,
      |    pow(1.0 / (1.0 - (2.0 / 13.0)), CAST(count(close) OVER mwg AS DOUBLE)) AS u12,
      |    pow(1.0 / (1.0 - (2.0 / 27.0)), CAST(count(close) OVER mwg AS DOUBLE)) AS u26
      |  FROM candles
      |  WINDOW mwa AS (PARTITION BY user_id ORDER BY bucket),
      |         mwg AS (mwa ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mm AS (
      |  SELECT user_id, bucket, close,
      |    sum(close * u12) OVER mwg2 / sum(u12) OVER mwg2 -
      |    sum(close * u26) OVER mwg2 / sum(u26) OVER mwg2 AS macd
      |  FROM mu
      |  WINDOW mwb AS (PARTITION BY user_id ORDER BY bucket),
      |         mwg2 AS (mwb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ms AS (
      |  SELECT user_id, bucket, close, macd,
      |    pow(1.0 / (1.0 - (2.0 / 10.0)), CAST(count(macd) OVER mwg3 AS DOUBLE)) AS u9
      |  FROM mm
      |  WINDOW mwc AS (PARTITION BY user_id ORDER BY bucket),
      |         mwg3 AS (mwc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mf AS (
      |  SELECT user_id, bucket, close, macd,
      |    sum(macd * u9) OVER mwg4 / sum(u9) OVER mwg4 AS macd_sig
      |  FROM ms
      |  WINDOW mwd AS (PARTITION BY user_id ORDER BY bucket),
      |         mwg4 AS (mwd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |sig AS (
      |  SELECT user_id, bucket, close,
      |    CASE WHEN macd > macd_sig AND lag(macd) OVER mwe <= lag(macd_sig) OVER mwe THEN 1
      |         WHEN macd < macd_sig AND lag(macd) OVER mwe >= lag(macd_sig) OVER mwe THEN -1
      |         ELSE 0 END AS signal
      |  FROM mf WINDOW mwe AS (PARTITION BY user_id ORDER BY bucket))""".stripMargin

  val w34BacktestSql: String = foldTradesCtes(smaSigCtes) + "\n" + foldFinalSelect
  val w34BacktestRsiSql: String = foldTradesCtes(rsiSigCtes) + "\n" + foldFinalSelect
  val w34BacktestMacdSql: String = foldTradesCtes(macdSigCtes) + "\n" + foldFinalSelect

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

  /** The A11 metric chain over a preceding CTE
    * `trades(user_id, entry_time, exit_time, pnl, return_pct)` — shared
    * by the fixture oracle and the fold-fed [[a11BacktestMetricsSql]].
    * (Window aliases unique per the WITH RECURSIVE namespace rule.) */
  private val metricsChainSql: String =
    """curve0 AS (
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

  val a11MetricsFixtureSql: String = Tables.candlesSql +
    """, numbered AS (
      |  SELECT user_id, bucket, close,
      |         row_number() OVER nw AS rn,
      |         lag(bucket, 10) OVER nw AS entry_time,
      |         lag(close, 10) OVER nw AS entry_close
      |  FROM candles
      |  WINDOW nw AS (PARTITION BY user_id ORDER BY bucket)),
      |trades AS (
      |  SELECT user_id, entry_time, bucket AS exit_time,
      |         round(close - entry_close, 6) + 0 AS pnl,
      |         round((close - entry_close) / entry_close, 6) + 0 AS return_pct
      |  FROM numbered
      |  WHERE rn % 10 = 0 AND entry_close IS NOT NULL),
      |""".stripMargin + metricsChainSql

  /** A11 over the REAL fold-produced trades: the W34 recursive-CTE fold
    * feeds the same metric chain the fixture pins, so the full
    * trades → metrics path is oracle-checked end to end. */
  val a11BacktestMetricsSql: String =
    foldTradesCtes(smaSigCtes) +
      """,
        |trades AS (
        |  SELECT user_id, entry_time, exit_time,
        |         round(pnl, 6) + 0 AS pnl, round(return_pct, 6) + 0 AS return_pct
        |  FROM alltr),
        |""".stripMargin + metricsChainSql

  // ---------------------------------------------------------------- cusum
  /** CUSUM changepoint detection on daily event rates — the monitoring
    * fold [[graft.scale.Sampling.driftPsi]]'s distribution view can't
    * express: `s_t = max(0, s_{t-1} + z_t − k)` accumulates small
    * sustained shifts and alarms when `s_t > h` (k = 0.5, h = 4 —
    * standard one-sided CUSUM tuning), catching a slow rate creep that
    * per-day thresholds miss. z-scores come from EXACT integer moments
    * (count/sum/sum-of-squares — identical in both engines, unlike
    * streaming stddev implementations whose last-ulp differences would
    * compound through the fold); the fold streams per key via secondary
    * sort, state = one double. */
  def driftCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val fit = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .withColumn("vr",
        (col("s2") - col("s1") * lit(1.0) * col("s1") / col("c")) / (col("c") - 1))
      .filter(col("vr") > 0)
    val z = daily.join(broadcast(fit), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        ((col("n") - col("s1") * lit(1.0) / col("c")) / sqrt(col("vr"))).as("z"))
      .as[RateRow]
    z.groupByKey(_.event_type)
      .flatMapSortedGroups($"day") { (et: String, rows: Iterator[RateRow]) =>
        var s = 0.0
        rows.map { r =>
          s = math.max(0.0, s + r.z - 0.5)
          CusumRow(et, r.day, r.n, r.z, s, s > 4.0)
        }
      }
      .toDF()
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("z"), 6).as("z"), round(col("cusum"), 6).as("cusum"),
        col("alarm"))
  }

  val driftCusumSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |fit AS (
      |  SELECT event_type, count(*) AS c, CAST(sum(n) AS BIGINT) AS s1,
      |         CAST(sum(n * n) AS BIGINT) AS s2
      |  FROM daily GROUP BY 1),
      |fitv AS (
      |  SELECT *, (s2 - s1 * 1.0 * s1 / c) / (c - 1) AS vr FROM fit
      |  WHERE (s2 - s1 * 1.0 * s1 / c) / (c - 1) > 0),
      |zc AS (
      |  SELECT d.event_type, d.day, d.n,
      |         (d.n - f.s1 * 1.0 / f.c) / sqrt(f.vr) AS z,
      |         row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
      |  FROM daily d JOIN fitv f USING (event_type)),
      |p(event_type, rn, day, n, z, s) AS (
      |  SELECT event_type, rn, day, n, z,
      |         greatest(0.0::DOUBLE, z - 0.5) FROM zc WHERE rn = 1
      |  UNION ALL
      |  SELECT c.event_type, c.rn, c.day, c.n, c.z,
      |         greatest(0.0::DOUBLE, p.s + c.z - 0.5)
      |  FROM zc c JOIN p ON c.event_type = p.event_type AND c.rn = p.rn + 1)
      |SELECT event_type, day, n AS n_events, round(z, 6) + 0 AS z,
      |       round(s, 6) + 0 AS cusum, s > 4.0 AS alarm
      |FROM p""".stripMargin

  // ---------------------------------------------------------------- W39
  /** Heikin-Ashi candles — the smoothed-candle transform FOREX trend
    * systems chart on (beyond the reference's surface, same family as
    * its candle anatomy / pattern operators). ha_close is the OHLC
    * mean; ha_open is RECURSIVE — the midpoint of the previous HA
    * candle — so this is a [[psar]]-style sorted-group fold with O(1)
    * state per key, not a window. ha_high/low clamp the raw extremes
    * around the synthetic body; is_bull tags the smoothed direction.
    * Oracle: the same recurrence as a lockstep recursive CTE, identical
    * arithmetic order per step ⇒ bit-identical doubles. */
  def heikinAshi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = candleDs(spark, dir)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[CandleRow]) =>
        var prevO = 0.0
        var prevC = 0.0
        var first = true
        rows.map { r =>
          val haClose = (r.open + r.high + r.low + r.close) / 4
          val haOpen = if (first) { first = false; (r.open + r.close) / 2 }
                       else (prevO + prevC) / 2
          prevO = haOpen; prevC = haClose
          HaRow(uid, r.bucket, haOpen,
            math.max(r.high, math.max(haOpen, haClose)),
            math.min(r.low, math.min(haOpen, haClose)),
            haClose, haClose > haOpen)
        }
      }
    // NOT round(_, 6): the /2 and /4 recurrence makes HA values dyadic
    // rationals, so landing EXACTLY on a .5 at the 6th decimal is
    // routine (not the usual 1-in-10^5 ulp fluke) and Spark's HALF_UP
    // disagrees with DuckDB's half-to-even there. floor(x·1e6 + 0.5) is
    // HALF_UP spelled in IEEE ops both engines run bit-identically.
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    out.select(col("user_id"), col("bucket"),
      r6(col("ha_open")).as("ha_open"),
      r6(col("ha_high")).as("ha_high"),
      r6(col("ha_low")).as("ha_low"),
      r6(col("ha_close")).as("ha_close"),
      col("is_bull"))
  }

  val heikinAshiSql: String =
    s"""$recursiveCandles,
       |hc AS (SELECT user_id, bucket, open, high, low, close,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn
       |       FROM candles),
       |ha(user_id, rn, bucket, high, low, ha_open, ha_close) AS (
       |  SELECT user_id, rn, bucket, high, low,
       |         (open + close) / 2,
       |         (open + high + low + close) / 4
       |  FROM hc WHERE rn = 1
       |  UNION ALL
       |  SELECT c.user_id, c.rn, c.bucket, c.high, c.low,
       |         (p.ha_open + p.ha_close) / 2,
       |         (c.open + c.high + c.low + c.close) / 4
       |  FROM hc c JOIN ha p ON c.user_id = p.user_id AND c.rn = p.rn + 1)
       |SELECT user_id, bucket,
       |  floor(ha_open * 1e6 + 0.5) / 1e6 AS ha_open,
       |  floor(greatest(high, ha_open, ha_close) * 1e6 + 0.5) / 1e6 AS ha_high,
       |  floor(least(low, ha_open, ha_close) * 1e6 + 0.5) / 1e6 AS ha_low,
       |  floor(ha_close * 1e6 + 0.5) / 1e6 AS ha_close,
       |  ha_close > ha_open AS is_bull
       |FROM ha""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w39_heikin_ashi"   -> (heikinAshi _),
    "drift_cusum"       -> (driftCusum _),
    "w19_psar"          -> (psar _),
    "w34_backtest"      -> (backtestTrades _),
    "w34_backtest_rsi"  -> (backtestTradesRsi _),
    "w34_backtest_macd" -> (backtestTradesMacd _),
    "a11_backtest_metrics" -> (backtestMetrics _),
    "a11_metrics_fixture"  -> (a11MetricsFixture _))

  def oracles: Map[String, String] = Map(
    "w39_heikin_ashi"   -> heikinAshiSql,
    "drift_cusum"       -> driftCusumSql,
    "w19_psar"          -> psarSql,
    "w34_backtest"      -> w34BacktestSql,
    "w34_backtest_rsi"  -> w34BacktestRsiSql,
    "w34_backtest_macd" -> w34BacktestMacdSql,
    "a11_backtest_metrics" -> a11BacktestMetricsSql,
    "a11_metrics_fixture"  -> a11MetricsFixtureSql)
}
