package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One synthetic tick (S9 — `premium_data_provider.py:303-344`). */
case class Tick(ts: java.sql.Timestamp, symbol: String,
                bid: Double, ask: Double, mid: Double, spread: Double)

/** ml_features channel row (T3 — `websocket_manager.py:340-400`):
  * trailing SMAs, RSI, the derived target/confidence, and the inline
  * min-max-normalized feature vector the reference ships per message. */
case class TickFeatures(symbol: String, ts: java.sql.Timestamp,
                        n_ticks: Int, sma_5: Double, sma_20: Double,
                        rsi_14: Double, mid: Double,
                        sma_10: Double, price_dev_sma20: Double, range_5: Double,
                        target_signal: Int, confidence: Double,
                        normalized_features: Seq[Double])

/** Ring-buffer state for trailing-N features. */
case class RingState(prices: Vector[Double])

/** One OHLC candle flowing through the pattern-alert channel. */
case class StreamCandle(bucket: java.sql.Timestamp, symbol: String,
                        open: Double, high: Double, low: Double, close: Double)

/** pattern_alerts channel row (T1 — `pattern_detection.py:49-60`). */
case class PatternAlert(symbol: String, bucket: java.sql.Timestamp,
                        pattern: String, confidence: Double, price_level: Double)

/** Last-2-candles state for pattern detection across micro-batches. */
case class CandleHistory(last: Vector[StreamCandle])

/** Heikin-Ashi recurrence state: the previous HA candle's midpoint pair. */
case class HaState(prevOpen: Double, prevClose: Double, lastBucketMs: Long)

/** One Heikin-Ashi candle emitted by the streaming channel. */
case class HaStreamRow(symbol: String, bucket: java.sql.Timestamp,
    ha_open: Double, ha_high: Double, ha_low: Double, ha_close: Double,
    is_bull: Boolean)

/** ZigZag per-symbol streaming state: the shared batch core
  * ([[graft.analysis.ZigzagRenko.ZzCore]] fields, flattened for a plain
  * product encoder) plus the last folded bucket for late-row drops. */
case class ZzStreamState(d: Int, extV: Double, extBMs: Long,
    prevPiv: Double, hasPrev: Boolean, lastMs: Long, seeded: Boolean)

/** One CONFIRMED ZigZag pivot emitted by the streaming channel. */
case class ZigzagAlert(symbol: String, bucket: java.sql.Timestamp,
    price: Double, pivot_type: String, swing_pct: Option[Double])

/** Renko per-symbol streaming state: the shared batch core
  * ([[graft.analysis.ZigzagRenko.RenkoCore]] fields, flattened) plus
  * the last folded bucket for late-row drops. */
case class RenkoStreamState(anchor: Double, no: Long, lastMs: Long, seeded: Boolean)

/** One Renko brick emitted by the streaming channel. */
case class RenkoBrickRow(symbol: String, bucket: java.sql.Timestamp,
    brick_no: Long, brick_open: Double, brick_close: Double, direction: String)

/** GARCH per-symbol streaming state: the previous close (to form the
  * return the batch side gets from a window lag), the shared
  * [[graft.operators.GarchCore]] fields flattened, and the last folded
  * bucket for late-row drops. */
case class GarchStreamState(prevClose: Double, prevR: Double, s2: Double,
    seeded: Boolean, lastMs: Long, havePrev: Boolean)

/** One conditional-vol row emitted by the GARCH channel (raw doubles —
  * rounding is presentation, done by consumers/specs). */
case class GarchVolRow(symbol: String, bucket: java.sql.Timestamp,
    ret: Double, cond_vol_bp: Double)

/** Per-window symbol tallies for the trending channel. */
case class TrendState(counts: Map[String, Long])

/** One trending-symbols row, emitted when the watermark closes the
  * window. */
case class TrendingRow(window_start: java.sql.Timestamp, rank: Int,
    symbol: String, n_ticks: Long)

/** Structured Streaming channels — SURVEY §2.10.
  *
  * The reference streams 8 processing-time asyncio channels over
  * WebSocket; here each channel is a StreamingQuery DAG over a shared
  * tick source, upgraded to event-time with watermarks (the semantics
  * the reference lacks — SURVEY §2.10 "to add"). Channel cadences map to
  * `Trigger.ProcessingTime`; fan-out/subscription management is a sink
  * concern (Kafka topics per channel at scale), not engine work.
  *
  * State sizing at scale: candle aggregation state = |symbols × open
  * windows| (watermark bounds it); ring-buffer state = 100 doubles per
  * symbol. Both are keyed by symbol ⇒ partition-parallel.
  */
object Channels {

  /** Channel cadences (T1 — `websocket_manager.py:200-209`). */
  val channelTriggers: Map[String, Trigger] = Map(
    "raw_ticks"          -> Trigger.ProcessingTime("100 milliseconds"),
    "order_book"         -> Trigger.ProcessingTime("200 milliseconds"),
    "trading_signals"    -> Trigger.ProcessingTime("500 milliseconds"),
    "ml_features"        -> Trigger.ProcessingTime("1 second"),
    "technical_analysis" -> Trigger.ProcessingTime("1 second"),
    "pattern_alerts"     -> Trigger.ProcessingTime("2 seconds"),
    "microstructure"     -> Trigger.ProcessingTime("5 seconds"),
    "economic_events"    -> Trigger.ProcessingTime("10 seconds"))

  /** S9 — deterministic synthetic tick stream from the rate source:
    * price walk driven by the rate value, three symbols round-robin. */
  def tickSource(spark: SparkSession, rowsPerSecond: Int = 100,
      nSymbols: Int = 3): DataFrame =
    decorateTicks(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load(), nSymbols)

  /** Pure column transform rate→ticks, shared with tests (batch or
    * stream DataFrames with (timestamp, value)). `nSymbols` widens the
    * key population — a keyed state fold is serial PER KEY, so the
    * saturation ceiling scales with it (the STREAMBENCH_KNEE receipt). */
  def decorateTicks(rate: DataFrame, nSymbols: Int = 3): DataFrame = {
    val mid = lit(1.08) + sin(col("value") / 7.0) * 0.002 + (col("value") % 17) * 1e-5
    val spread = lit(0.00008) + (col("value") % 5) * 1e-6
    rate.select(
      col("timestamp").as("ts"),
      concat(lit("PAIR"), (col("value") % nSymbols).cast("int")).as("symbol"),
      (mid - spread / 2).as("bid"),
      (mid + spread / 2).as("ask"),
      mid.as("mid"),
      spread.as("spread"))
  }

  /** A4 in streaming mode — 1-minute tumbling candles with a 2-minute
    * watermark; first/last via min_by/max_by over the in-window tick
    * time (deterministic, SURVEY §7.5). */
  def candleStream(ticks: DataFrame): DataFrame =
    ticks.withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("symbol"))
      .agg(
        min_by(col("mid"), col("ts")).as("open"),
        max(col("mid")).as("high"),
        min(col("mid")).as("low"),
        max_by(col("mid"), col("ts")).as("close"),
        count(lit(1)).as("n_ticks"),
        avg(col("spread")).as("avg_spread"))
      .select(col("w.start").as("bucket"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"), col("avg_spread"))

  /** K1 streaming upsert semantics — dedup within the watermark on the
    * natural key (`repository.py:28-96` ≙ `dropDuplicatesWithinWatermark`). */
  def dedupedTicks(ticks: DataFrame): DataFrame =
    ticks.withWatermark("ts", "2 minutes")
      .dropDuplicatesWithinWatermark("symbol", "ts")

  /** T3 — trailing-100-tick features per symbol via a ring buffer in
    * `flatMapGroupsWithState` (the reference's in-memory deque). Ticks
    * are sorted by event time within each micro-batch; cross-batch order
    * follows micro-batch arrival (processing-time like the reference). */
  def featureStream(spark: SparkSession, ticks: DataFrame): Dataset[TickFeatures] = {
    import spark.implicits._
    ticks.select(col("ts"), col("symbol"), col("mid")).as[(java.sql.Timestamp, String, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[RingState, TickFeatures](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[(java.sql.Timestamp, String, Double)],
         state: GroupState[RingState]) =>
          var buf = state.getOption.map(_.prices).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(_._1.getTime).map { case (ts, _, mid) =>
            buf = (buf :+ mid).takeRight(100)
            val n = buf.size
            def sma(k: Int): Double =
              if (n >= k) buf.takeRight(k).sum / k else Double.NaN
            // standard RSI: all-gains ⇒ 100 (the reference's rs=0 branch
            // at `websocket_manager.py:370-371` inverts this — a bug)
            val rsi = if (n >= 15) {
              val diffs = buf.takeRight(15).sliding(2).map(p => p(1) - p(0)).toSeq
              val g = diffs.map(d => math.max(d, 0)).sum / 14
              val l = diffs.map(d => math.max(-d, 0)).sum / 14
              if (l == 0) 100.0 else 100.0 - 100.0 / (1 + g / l)
            } else Double.NaN
            val s5 = sma(5); val s10 = sma(10); val s20 = sma(20)
            val dev = if (s20 > 0) (mid - s20) / s20 else Double.NaN
            val rng5 = if (n >= 5) buf.takeRight(5).max - buf.takeRight(5).min else Double.NaN
            val fv = Seq(mid, s5, s10, s20, rsi, dev, rng5)
            val norm = if (fv.forall(v => !v.isNaN)) {
              val lo = fv.min; val hi = fv.max
              if (hi > lo) fv.map(v => (v - lo) / (hi - lo)) else fv.map(_ => 0.0)
            } else Seq.empty[Double]
            val target = if (rsi < 30) 2 else if (rsi > 70) 1 else 0 // 2=buy,1=sell,0=hold
            val conf = if (rsi.isNaN) 0.0 else math.min(math.abs(rsi - 50) / 50, 1.0)
            TickFeatures(symbol, ts, n, s5, s20, rsi, mid,
              s10, dev, rng5, target, conf, norm)
          }
          state.update(RingState(buf))
          out.iterator
      }
  }

  /** T4 — trading signals (`websocket_manager.py:402-448`): RSI bands ×
    * SMA-20 position, with pip-offset stop-loss/take-profit. */
  def signalStream(features: DataFrame): DataFrame =
    features.select(
      col("symbol"), col("ts"), col("mid"),
      when(col("rsi_14") < 30 && col("mid") < col("sma_20"), "buy")
        .when(col("rsi_14") > 70 && col("mid") > col("sma_20"), "sell")
        .otherwise("hold").as("signal"),
      when(col("rsi_14") < 30, col("mid") - 0.0010)
        .when(col("rsi_14") > 70, col("mid") + 0.0010).as("stop_loss"),
      when(col("rsi_14") < 30, col("mid") + 0.0020)
        .when(col("rsi_14") > 70, col("mid") - 0.0020).as("take_profit"))

  /** T5 — technical-analysis summary (`websocket_manager.py:476-508`):
    * trend from the SMA chain, momentum from |RSI−50|. */
  def taStream(features: DataFrame): DataFrame =
    features.select(
      col("symbol"), col("ts"),
      when(col("sma_5") > col("sma_20"), "uptrend")
        .when(col("sma_5") < col("sma_20"), "downtrend")
        .otherwise("sideways").as("trend"),
      when(abs(col("rsi_14") - 50) > 25, "strong")
        .when(abs(col("rsi_14") - 50) > 10, "moderate")
        .otherwise("weak").as("momentum"),
      (col("mid") - 0.0020).as("support"),
      (col("mid") + 0.0040).as("resistance"))

  /** T6 — order_book channel (S8 streaming, `polygon_client.py:236-296`):
    * synthesize `depth` levels around each tick's bid/ask with decaying,
    * side-skewed size; imbalance from the size totals. Stateless map —
    * trivially partition-parallel at any rate. */
  def orderBookStream(ticks: DataFrame, depth: Int = 5): DataFrame = {
    val pip = lit(0.0001)
    val skew = sin(col("mid") * 10000) * 0.2
    def sizes(sign: Int) = transform(sequence(lit(0), lit(depth - 1)),
      i => floor(lit(1000000.0) / (i + 1) * (lit(1.0) + lit(sign) * skew)))
    ticks.select(
        col("ts"), col("symbol"), col("bid"), col("ask"),
        transform(sequence(lit(0), lit(depth - 1)),
          i => struct((col("bid") - i * pip).as("price"),
            floor(lit(1000000.0) / (i + 1) * (lit(1.0) + skew)).as("size"))).as("bids"),
        transform(sequence(lit(0), lit(depth - 1)),
          i => struct((col("ask") + i * pip).as("price"),
            floor(lit(1000000.0) / (i + 1) * (lit(1.0) - skew)).as("size"))).as("asks"),
        aggregate(sizes(1), lit(0.0), _ + _).as("bid_total"),
        aggregate(sizes(-1), lit(0.0), _ + _).as("ask_total"))
      .withColumn("imbalance",
        (col("bid_total") - col("ask_total")) / (col("bid_total") + col("ask_total")))
  }

  /** T1 pattern_alerts — candle patterns over a candle stream
    * (`pattern_detection.py:102-286` in streaming form): the batch lag-1
    * comparisons become a last-2-candles state per symbol in
    * `flatMapGroupsWithState` (streams admit no lag window). */
  def patternAlertStream(spark: SparkSession, candles: Dataset[StreamCandle]): Dataset[PatternAlert] = {
    import spark.implicits._
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[CandleHistory, PatternAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[StreamCandle], state: GroupState[CandleHistory]) =>
          var hist = state.getOption.map(_.last).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(_.bucket.getTime).flatMap { c =>
            val body = math.abs(c.close - c.open)
            val rng = c.high - c.low
            val strength = if (rng > 0) body / rng else 0.0
            val doji = if (rng > 0 && body < 0.1 * rng)
              Some(PatternAlert(symbol, c.bucket, "doji", 1.0 - strength, c.close)) else None
            val engulf = hist.lastOption.flatMap { p =>
              val pBody = math.abs(p.close - p.open)
              if (c.close > c.open && p.close < p.open && c.close > p.open &&
                  c.open < p.close && body > pBody)
                Some(PatternAlert(symbol, c.bucket, "bullish_engulfing", strength, c.close))
              else if (c.close < c.open && p.close > p.open && c.open > p.close &&
                  c.close < p.open && body > pBody)
                Some(PatternAlert(symbol, c.bucket, "bearish_engulfing", strength, c.close))
              else None
            }
            hist = (hist :+ c).takeRight(2)
            doji.toSeq ++ engulf.toSeq
          }
          state.update(CandleHistory(hist))
          out.iterator
      }
  }

  /** Heikin-Ashi candles over a candle stream — the streaming form of
    * the batch [[graft.analysis.Stateful.heikinAshi]] fold, with the
    * IDENTICAL recurrence (ha_open = midpoint of the previous HA
    * candle) carried as 2-double state per symbol in
    * `flatMapGroupsWithState`. Batch-equivalence is CHECKED, not
    * asserted: `ChannelsSpec` streams the real candle table through
    * this and diffs against the oracled batch query row-for-row.
    *
    * Late-arrival contract (ADVICE r5): the recurrence is
    * order-SENSITIVE — folding a stale candle after newer ones would
    * corrupt ha_open for the symbol from then on, silently and forever.
    * Rows are sorted within a micro-batch, and a row at or behind the
    * last folded bucket (cross-batch disorder) is DROPPED rather than
    * folded: a gap in the output is visible and recoverable (re-run the
    * batch fold), corrupted state is neither. State at scale:
    * (prevOpen, prevClose, lastBucket) per symbol — O(symbols). */
  def heikinAshiStream(spark: SparkSession,
      candles: Dataset[StreamCandle]): Dataset[HaStreamRow] = {
    import spark.implicits._
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[HaState, HaStreamRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[StreamCandle], state: GroupState[HaState]) =>
          var seeded = state.exists
          var pO = if (seeded) state.get.prevOpen else 0.0
          var pC = if (seeded) state.get.prevClose else 0.0
          var lastMs = if (seeded) state.get.lastBucketMs else Long.MinValue
          // the stale-row guard reads the LIVE lastMs inside the fold —
          // a strict pre-filter would evaluate against the pre-batch
          // state and let an at-least-once source's duplicate WITHIN
          // one micro-batch fold twice
          val out = rows.toSeq.sortBy(_.bucket.getTime)
            .flatMap { c =>
              if (c.bucket.getTime <= lastMs) None // late duplicate/straggler
              else {
                val haC = (c.open + c.high + c.low + c.close) / 4
                val haO = if (!seeded) { seeded = true; (c.open + c.close) / 2 }
                          else (pO + pC) / 2
                pO = haO; pC = haC; lastMs = c.bucket.getTime
                Some(HaStreamRow(symbol, c.bucket, haO,
                  math.max(c.high, math.max(haO, haC)),
                  math.min(c.low, math.min(haO, haC)),
                  haC, haC > haO))
              }
            }
          if (seeded) state.update(HaState(pO, pC, lastMs))
          out.iterator
      }
  }

  /** ZigZag pivot alerts over a candle stream — the streaming form of
    * the batch [[graft.analysis.ZigzagRenko.w41Zigzag]] fold, driving
    * the SAME transition function (`ZigzagRenko.zzStep`) so the two
    * implementations cannot drift; the equivalence spec checks the
    * plumbing (state carry across micro-batches, late-row drops).
    * Only CONFIRMED pivots are emitted: the batch query's series-end
    * provisional pivot is a retractable row, and append mode admits no
    * retraction — a downstream consumer reads the live extreme from its
    * own last candle instead. Late candles (at or behind the last
    * folded bucket) are dropped, same contract as
    * [[heikinAshiStream]]. State: 5 scalars + 2 longs per symbol. */
  def zigzagStream(spark: SparkSession,
      candles: Dataset[StreamCandle]): Dataset[ZigzagAlert] = {
    import spark.implicits._
    import graft.analysis.ZigzagRenko
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[ZzStreamState, ZigzagAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[StreamCandle], state: GroupState[ZzStreamState]) =>
          var st = state.getOption.getOrElse(
            ZzStreamState(0, 0.0, 0L, 0.0, hasPrev = false, Long.MinValue, seeded = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[ZigzagAlert]
          // live-state stale guard, same reasoning as heikinAshiStream:
          // a strict pre-filter misses duplicates within one micro-batch
          rows.toSeq.sortBy(_.bucket.getTime)
            .foreach { c =>
              val ms = c.bucket.getTime
              if (ms <= st.lastMs) () // late duplicate/straggler
              else if (!st.seeded)
                st = ZzStreamState(0, c.close, ms, 0.0, hasPrev = false, ms, seeded = true)
              else {
                val core = ZigzagRenko.ZzCore(st.d, st.extV, st.extBMs, st.prevPiv, st.hasPrev)
                val (nc, piv) = ZigzagRenko.zzStep(core, c.close, ms)
                piv.foreach { case (pms, v, tp, sw) =>
                  out += ZigzagAlert(symbol, new java.sql.Timestamp(pms), v, tp, sw)
                }
                st = ZzStreamState(nc.d, nc.extV, nc.extBMs, nc.prevPiv, nc.hasPrev,
                  ms, seeded = true)
              }
            }
          if (st.seeded) state.update(st)
          out.iterator
      }
  }

  /** Renko bricks over a candle stream — the streaming form of the
    * batch [[graft.analysis.ZigzagRenko.w41Renko]] fold, driving the
    * SAME transition function (`ZigzagRenko.renkoStep`) so the two
    * cannot drift. Brick sizes are a per-symbol CONFIGURATION here
    * (broadcast-sized map in the closure): the batch query fits
    * 1/16 of each key's full price range, which an unbounded stream
    * cannot know — production Renko feeds take the brick as a
    * parameter fit offline from history, and the equivalence spec does
    * exactly that (batch-fit bricks driven through the channel
    * reproduce the batch bricks row-for-row). Symbols without a
    * configured brick pass through statefully but emit nothing
    * (renkoStep no-ops on brick ≤ 0). Late candles (at or behind the
    * last folded bucket, read from LIVE state so at-least-once
    * duplicates within one micro-batch fold once) are dropped — same
    * contract as [[heikinAshiStream]]/[[zigzagStream]]. State: 2
    * scalars + 2 longs per symbol. */
  def renkoStream(spark: SparkSession, candles: Dataset[StreamCandle],
      bricks: Map[String, Double]): Dataset[RenkoBrickRow] = {
    import spark.implicits._
    import graft.analysis.ZigzagRenko
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[RenkoStreamState, RenkoBrickRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[StreamCandle], state: GroupState[RenkoStreamState]) =>
          val brick = bricks.getOrElse(symbol, 0.0)
          var st = state.getOption.getOrElse(
            RenkoStreamState(0.0, 0L, Long.MinValue, seeded = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[RenkoBrickRow]
          rows.toSeq.sortBy(_.bucket.getTime)
            .foreach { c =>
              val ms = c.bucket.getTime
              if (ms <= st.lastMs) () // late duplicate/straggler
              else if (!st.seeded)
                st = RenkoStreamState(c.close, 0L, ms, seeded = true)
              else {
                val (nc, emitted) =
                  ZigzagRenko.renkoStep(ZigzagRenko.RenkoCore(st.anchor, st.no), c.close, brick)
                emitted.foreach { case (no, o, cl, dir) =>
                  out += RenkoBrickRow(symbol, c.bucket, no, o, cl, dir)
                }
                st = RenkoStreamState(nc.anchor, nc.no, ms, seeded = true)
              }
            }
          if (st.seeded) state.update(st)
          out.iterator
      }
  }

  /** Streaming GARCH(1,1) conditional volatility per symbol — the
    * streaming form of the batch
    * [[graft.operators.IndicatorPack3.w49GarchVol]] fold, driving the
    * SAME transition function (`IndicatorPack3.garchStep`) so the two
    * cannot drift: the only streaming-side addition is forming the
    * return from the previous close held in state (the batch side gets
    * it from a window lag). Parameters are the pinned offline-fit
    * configuration, exactly like Renko's broadcast brick sizes. Late
    * or duplicate candles (at or behind the last folded bucket, read
    * from LIVE state so at-least-once duplicates within one
    * micro-batch fold once) are dropped — the suite-wide guard
    * contract. State: 3 doubles + 1 long per symbol. */
  def garchVolStream(spark: SparkSession,
      candles: Dataset[StreamCandle]): Dataset[GarchVolRow] = {
    import spark.implicits._
    import graft.operators.{GarchCore, IndicatorPack3}
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[GarchStreamState, GarchVolRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[StreamCandle], state: GroupState[GarchStreamState]) =>
          var st = state.getOption.getOrElse(
            GarchStreamState(0.0, 0.0, 0.0, seeded = false,
              Long.MinValue, havePrev = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[GarchVolRow]
          rows.toSeq.sortBy(_.bucket.getTime).foreach { c =>
            val ms = c.bucket.getTime
            if (ms <= st.lastMs) () // late duplicate/straggler
            else if (!st.havePrev)
              st = st.copy(prevClose = c.close, lastMs = ms, havePrev = true)
            else if (st.prevClose == 0)
              // zero-price rule (batch w49 parity): a return off a zero
              // close is UNDEFINED — emit nothing, keep the GARCH core,
              // advance the price cursor past the dirty bar.
              st = st.copy(prevClose = c.close, lastMs = ms)
            else {
              val r = (c.close - st.prevClose) / st.prevClose
              val nc = IndicatorPack3.garchStep(
                GarchCore(st.prevR, st.s2, st.seeded), r)
              out += GarchVolRow(symbol, c.bucket, r, 10000.0 * math.sqrt(nc.s2))
              st = GarchStreamState(c.close, nc.prevR, nc.s2, nc.seeded,
                ms, havePrev = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Trending symbols per 1-minute event-time window — top-k by tick
    * count, emitted exactly once per window WHEN THE WATERMARK CLOSES
    * IT. This is the one Structured Streaming state pattern the channel
    * suite didn't yet exercise: `EventTimeTimeout` — a windowed TOP-K
    * needs an aggregate over an aggregate, which streaming append mode
    * can't express as two groupBys, so the inner tally lives in
    * `flatMapGroupsWithState` state keyed by window start and the
    * ranking runs in the timeout callback (fires once the watermark
    * passes the window end; state is removed on emission, so state size
    * = |open windows × active symbols|, watermark-bounded). Input must
    * carry `ts` + `symbol`; rows later than the 30 s watermark are
    * dropped by the engine before they reach the state. */
  def trendingStream(spark: SparkSession, ticks: DataFrame, k: Int = 3): Dataset[TrendingRow] = {
    import spark.implicits._
    val windowMs = 60000L // single source for the window length
    ticks
      .withWatermark("ts", "30 seconds")
      // ts stays in the row: the watermark tag lives on the column, and
      // EventTimeTimeout requires the watermarked attribute to survive
      // into the stateful operator's input
      .select(window(col("ts"), s"$windowMs milliseconds").getField("start").as("wstart"),
        col("symbol"), col("ts"))
      .as[(java.sql.Timestamp, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TrendState, TrendingRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart: java.sql.Timestamp,
         rows: Iterator[(java.sql.Timestamp, String, java.sql.Timestamp)],
         state: GroupState[TrendState]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            state.remove()
            counts.toSeq.sortBy { case (s, n) => (-n, s) }.take(k).zipWithIndex
              .map { case ((s, n), i) => TrendingRow(wstart, i + 1, s, n) }
              .iterator
          } else {
            val counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            val upd = rows.foldLeft(counts) { case (m, (_, sym, _)) =>
              m.updated(sym, m.getOrElse(sym, 0L) + 1L)
            }
            state.update(TrendState(upd))
            // fire just past the window end — always ahead of the
            // watermark, since any row reaching the state has
            // ts ≥ watermark and ts < window end
            state.setTimeoutTimestamp(wstart.getTime + windowMs + 1)
            Iterator.empty
          }
      }
  }

  /** T6 economic_events — simulated calendar emission
    * (`websocket_manager.py:539-563`): rate source at the channel cadence
    * → deterministic event fields. */
  def economicEventsStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    decorateEconomicEvents(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** Pure column transform rate→economic events, shared with tests. */
  def decorateEconomicEvents(rate: DataFrame): DataFrame =
    rate.select(
      col("timestamp").as("ts"),
      element_at(array(lit("cpi"), lit("nfp"), lit("ecb_rate"), lit("fomc")),
        (col("value") % 4 + 1).cast("int")).as("event_type"),
      element_at(array(lit("low"), lit("medium"), lit("high")),
        (col("value") % 3 + 1).cast("int")).as("impact"),
      (sin(col("value") / 3.0) * 0.5).as("surprise"),
      concat(lit("EVT"), col("value")).as("event_id"))

  /** Stream-stream interval join — the Structured Streaming capability
    * the channel suite still lacked: each high-impact economic event
    * joins every tick in the 2 minutes AFTER it, measuring post-event
    * price drift per symbol (the reference pushes both feeds to clients
    * and leaves correlation to them; a real engine does it in-stream).
    * BOTH sides are watermarked and the join predicate bounds the tick
    * time from both ends relative to the event time — the two conditions
    * Spark needs to size the join state and EXPIRE rows as the watermark
    * advances (an unbounded stream-stream join never GCs its buffers).
    * Spark additionally requires an EQUALITY predicate, so the interval
    * condition gets the same banding rewrite as the batch range join
    * (`Joins.j7RangeJoin`): both sides carry a 2-minute time band, the
    * event side explodes into its ≤2 covering bands, and the join is an
    * equi join on the band plus the residual range filter. State at
    * scale = 2 minutes of ticks + 2 minutes of events per band
    * partition, independent of stream length. */
  def eventImpactStream(ticks: DataFrame, econ: DataFrame): DataFrame = {
    def band(c: org.apache.spark.sql.Column) =
      timestamp_seconds((unix_seconds(c) / 120).cast("long") * 120)
    val t = ticks.withWatermark("ts", "2 minutes")
      .select(col("ts").as("tick_ts"), col("symbol"), col("mid"),
        band(col("ts")).as("band"))
    val e = econ.withWatermark("ts", "2 minutes")
      .filter(col("impact") === "high")
      .select(col("ts").as("event_ts"), col("event_id"),
        col("event_type").as("econ_type"), col("surprise"),
        explode(array(band(col("ts")),
          band(col("ts")) + expr("INTERVAL 2 MINUTES"))).as("band"))
    t.join(e,
        t("band") === e("band") &&
        col("tick_ts") >= col("event_ts") &&
        col("tick_ts") <= col("event_ts") + expr("INTERVAL 2 MINUTES"))
      .select(col("event_id"), col("econ_type"), col("surprise"),
        col("symbol"), col("tick_ts"), col("mid"),
        (unix_millis(col("tick_ts")) - unix_millis(col("event_ts"))).as("ms_after_event"))
  }

  /** K6/T2/T9 — broadcast sink with ring-buffer retention
    * (`websocket_manager.py:565-597`, buffer `:249-252`): `foreachBatch`
    * envelopes each row (channel, sequence, emit latency) and appends to
    * a bounded per-channel buffer — the engine-side stand-in for the
    * WebSocket fan-out (per-client delivery/auth is sink-side, T7/T8; at
    * scale this is a Kafka topic per channel and the buffer is the
    * topic's retention). Sequence numbers are per-batch row_number plus a
    * running offset — the T2 envelope exactly. */
  final class RingBufferSink(channel: String, capacity: Int = 1000) extends Serializable {
    private val buf = new scala.collection.mutable.ArrayDeque[String]()
    private var offset = 0L
    def append(batch: DataFrame, batchId: Long): Unit = synchronized {
      // sequence is assigned on the driver at emit time (like the
      // reference's envelope counter) — partition-derived ids would be
      // non-contiguous and batch-order-unstable
      val payloads = batch.select(to_json(struct(col("*"))).as("msg"))
        .collect().map(_.getString(0))
      val enveloped = payloads.zipWithIndex.map { case (p, i) =>
        s"""{"stream_type":"$channel","sequence":${offset + i},"batch_id":$batchId,"payload":$p}"""
      }
      offset += enveloped.length
      buf.appendAll(enveloped)
      while (buf.size > capacity) buf.removeHead()
    }
    def start(df: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      df.writeStream
        .outputMode(OutputMode.Append())
        .trigger(channelTriggers.getOrElse(channel, Trigger.ProcessingTime("1 second")))
        .foreachBatch((b: DataFrame, id: Long) => append(b, id))
        .start()
    def snapshot: Seq[String] = synchronized(buf.toSeq)
    def totalEmitted: Long = synchronized(offset)
  }

  /** T6 — microstructure channel (A12 on a cadence): windowed spread /
    * tick-frequency stats. */
  def microstructureStream(ticks: DataFrame): DataFrame =
    ticks.withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "5 seconds").as("w"), col("symbol"))
      .agg(
        avg(col("spread")).as("avg_spread"),
        stddev(col("spread")).as("std_spread"),
        count(lit(1)).as("tick_count"),
        (max(col("mid")) - min(col("mid"))).as("price_range"))
      .select(col("w.start").as("bucket"), col("symbol"),
        col("avg_spread"), col("std_spread"), col("tick_count"), col("price_range"))
}
