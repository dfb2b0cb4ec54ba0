package graft.analysis

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties of the SHARED transition functions (zzStep,
  * renkoStep) — the single definitions both the batch folds and the
  * streaming channels drive. The fixture specs (ZigzagRenkoSpec,
  * ChannelsSpec) pin behavior on realistic series; these sample
  * adversarial ones — flat stretches, monotone runs, huge jumps, tiny
  * prices — directly against the pure functions, no Spark session.
  * (scalatestplus isn't in the offline cache, so generators are
  * sampled with fixed seeds, the NormalizerSpec pattern.) */
class TransitionPropSpec extends AnyFunSuite {

  private def forAllSampled[T](gen: Gen[T], n: Int = 40)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(1000L + i)).foreach(body)
    }

  /** Positive price series with mixed regimes: random walks, monotone
    * ramps, flats, and multiplicative jumps (bounded so a series can't
    * compound to a scale where a fixed brick implies millions of
    * emitted rows). */
  private val priceSeries: Gen[List[Double]] = for {
    n     <- Gen.choose(2, 60)
    start <- Gen.choose(0.5, 500.0)
    steps <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(0.97, 1.03),   // walk
      2 -> Gen.const(1.0),           // flat
      1 -> Gen.choose(1.1, 1.3),     // jump up (> the 10% zigzag bar)
      1 -> Gen.choose(0.7, 0.9)))    // jump down
  } yield steps.scanLeft(start)(_ * _)

  private def runZigzag(prices: List[Double]): (Seq[ZigzagRenko.ZzPivot], ZigzagRenko.ZzCore) = {
    var core = ZigzagRenko.zzInit(prices.head, 0L)
    val pivots = Seq.newBuilder[ZigzagRenko.ZzPivot]
    prices.tail.zipWithIndex.foreach { case (p, i) =>
      val (nc, piv) = ZigzagRenko.zzStep(core, p, i + 1L)
      core = nc
      piv.foreach(pivots += _)
    }
    (pivots.result(), core)
  }

  test("zigzag: confirmed pivot types strictly alternate on any positive series") {
    forAllSampled(priceSeries) { prices =>
      val (pivots, fin) = runZigzag(prices)
      val all = pivots ++ ZigzagRenko.zzFinish(fin).toSeq
      all.map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"consecutive '$a' pivots on $prices")
        case _ =>
      }
    }
  }

  test("zigzag: every confirmed swing magnitude is at least the 10% threshold") {
    forAllSampled(priceSeries) { prices =>
      val (pivots, _) = runZigzag(prices)
      // swing = (extreme - prevPivot) / prevPivot, rounded to 1e-6; the
      // confirm conditions guarantee the leg retraced >= Thr from the
      // PREVIOUS pivot's close-side bound, so inter-pivot swings clear
      // the threshold up to the rounding grain
      pivots.flatMap(_._4).foreach { s =>
        assert(math.abs(s) >= ZigzagRenko.Thr - 1e-6,
          s"sub-threshold swing $s on $prices")
      }
    }
  }

  test("zigzag: pivot prices are prices the series actually visited") {
    forAllSampled(priceSeries) { prices =>
      val seen = prices.map(p => math.floor(p * 1e6 + 0.5) / 1e6).toSet
      val (pivots, fin) = runZigzag(prices)
      (pivots ++ ZigzagRenko.zzFinish(fin).toSeq).foreach { case (_, v, _, _) =>
        assert(seen.contains(v), s"pivot $v never occurred in $prices")
      }
    }
  }

  /** Brick sized RELATIVE to the series start (2%–50%), like the batch
    * fit (range/16): keeps per-step emission counts bounded. */
  private val brickRel: Gen[Double] = Gen.choose(0.02, 0.5)

  test("renko: anchor stays within one brick of every close and on the seed lattice") {
    forAllSampled(Gen.zip(priceSeries, brickRel)) { case (prices, rel) =>
      val brick = prices.head * rel
      var core = ZigzagRenko.renkoInit(prices.head)
      val a0 = core.anchor
      prices.tail.foreach { p =>
        val (nc, _) = ZigzagRenko.renkoStep(core, p, brick)
        core = nc
        assert(math.abs(p - core.anchor) < brick,
          s"anchor ${core.anchor} more than a brick from close $p (brick $brick)")
        val steps = (core.anchor - a0) / brick
        assert(math.abs(steps - math.rint(steps)) < 1e-6,
          s"anchor ${core.anchor} off the $a0 + k*$brick lattice")
      }
    }
  }

  test("renko: brick numbering is consecutive and emission count matches the anchor walk") {
    forAllSampled(Gen.zip(priceSeries, brickRel)) { case (prices, rel) =>
      val brick = prices.head * rel
      var core = ZigzagRenko.renkoInit(prices.head)
      var expectedNo = 0L
      prices.tail.foreach { p =>
        val before = core.anchor
        val (nc, bricks) = ZigzagRenko.renkoStep(core, p, brick)
        core = nc
        bricks.foreach { case (no, _, _, dir) =>
          expectedNo += 1
          assert(no == expectedNo, s"brick_no $no, expected $expectedNo")
          assert(if (dir == "up") p > before else p < before)
        }
        val moved = math.rint(math.abs(nc.anchor - before) / brick).toLong
        assert(bricks.size.toLong == moved,
          s"${bricks.size} bricks emitted for a $moved-brick anchor move")
      }
    }
  }

  test("renko: a non-positive brick is a total no-op") {
    forAllSampled(priceSeries) { prices =>
      var core = ZigzagRenko.renkoInit(prices.head)
      prices.tail.foreach { p =>
        val (nc, bricks) = ZigzagRenko.renkoStep(core, p, 0.0)
        assert(bricks.isEmpty && nc == core)
        core = nc
      }
    }
  }

  // ------------------------------------------------------------------ psar
  /** Candle (high, low) series: a mid-price walk with a random
    * symmetric range, plus jump regimes that force trend flips. */
  private val candleSeries: Gen[List[(Double, Double)]] = for {
    prices <- priceSeries
    ranges <- Gen.listOfN(prices.size, Gen.choose(0.0, 0.05))
  } yield prices.zip(ranges).map { case (mid, r) =>
    (mid * (1 + r), mid * (1 - r))
  }

  private def runPsar(candles: List[(Double, Double)]): List[Stateful.PsarCore] = {
    val init = Stateful.psarInit(candles.head._1, candles.head._2)
    candles.tail.scanLeft(init) { case (st, (h, l)) =>
      Stateful.psarStep(st, h, l)
    }
  }

  test("psar: af stays on the 0.02 grid inside [0.02, 0.2]") {
    forAllSampled(candleSeries) { candles =>
      runPsar(candles).foreach { st =>
        assert(st.af >= 0.02 - 1e-12 && st.af <= 0.2 + 1e-12, s"af ${st.af}")
        val grid = st.af / 0.02
        assert(math.abs(grid - math.rint(grid)) < 1e-9,
          s"af ${st.af} off the 0.02 grid")
      }
    }
  }

  test("psar: a trend flip resets af and restarts SAR from the prior extreme") {
    forAllSampled(candleSeries) { candles =>
      val states = runPsar(candles)
      states.sliding(2).zip(candles.tail.iterator).foreach {
        case (Seq(prev, cur), (h, l)) =>
          if (cur.bull != prev.bull) {
            assert(cur.af == 0.02, s"flip af ${cur.af}")
            assert(cur.sar == prev.ep, s"flip SAR ${cur.sar} != prior ep ${prev.ep}")
            assert(cur.ep == (if (cur.bull) h else l),
              s"flip ep ${cur.ep} not the flip candle's extreme")
          }
        case _ =>
      }
    }
  }

  test("psar: on trend-surviving steps the SAR is outside the candle range") {
    forAllSampled(candleSeries) { candles =>
      val states = runPsar(candles)
      states.sliding(2).zip(candles.tail.iterator).foreach {
        case (Seq(prev, cur), (h, l)) if cur.bull == prev.bull =>
          if (cur.bull) assert(cur.sar < l, s"bull SAR ${cur.sar} >= low $l")
          else assert(cur.sar > h, s"bear SAR ${cur.sar} <= high $h")
        case _ =>
      }
    }
  }

  test("psar: within a trend, af is non-decreasing, rising exactly on new extremes," +
      " and ep ratchets toward the trend") {
    forAllSampled(candleSeries) { candles =>
      runPsar(candles).sliding(2).foreach {
        case Seq(prev, cur) if cur.bull == prev.bull =>
          assert(cur.af >= prev.af - 1e-12, s"af fell ${prev.af} -> ${cur.af} in-trend")
          val newExtreme = cur.ep != prev.ep
          val afRose = cur.af > prev.af + 1e-12
          assert(afRose == (newExtreme && prev.af < 0.2 - 1e-12),
            s"af ${prev.af}->${cur.af} vs extreme-change $newExtreme")
          if (cur.bull) assert(cur.ep >= prev.ep, "bull ep fell")
          else assert(cur.ep <= prev.ep, "bear ep rose")
        case _ =>
      }
    }
  }

  test("psar: after a trend-surviving step the SAR accelerates monotonically") {
    forAllSampled(candleSeries) { candles =>
      // once a no-flip step has run, bull holds ep > sar (sar < low <=
      // high <= ep) and bear holds ep < sar, so the NEXT in-trend SAR
      // strictly approaches the extreme
      runPsar(candles).sliding(3).foreach {
        case Seq(a, b, c) if a.bull == b.bull && b.bull == c.bull =>
          if (c.bull) assert(c.sar > b.sar, s"bull SAR stalled ${b.sar} -> ${c.sar}")
          else assert(c.sar < b.sar, s"bear SAR stalled ${b.sar} -> ${c.sar}")
        case _ =>
      }
    }
  }

  // ------------------------------------------------------------ supertrend
  /** SuperTrend feed: (close, rawUpper, rawLower) triples — a mid walk,
    * a band half-width (3×ATR stand-in, occasionally zero), and closes
    * that sometimes break far outside the bands. */
  private val stSeries: Gen[List[(Double, Double, Double)]] = for {
    mids   <- priceSeries
    widths <- Gen.listOfN(mids.size, Gen.frequency(
      8 -> Gen.choose(0.005, 0.08),
      1 -> Gen.const(0.0)))
    cfs    <- Gen.listOfN(mids.size, Gen.frequency(
      6 -> Gen.choose(0.99, 1.01),
      2 -> Gen.choose(1.05, 1.4),   // break above
      2 -> Gen.choose(0.6, 0.95)))  // break below
  } yield mids.lazyZip(widths).lazyZip(cfs).map { (m, w, cf) =>
    (m * cf, m * (1 + w), m * (1 - w))
  }

  private def runSt(feed: List[(Double, Double, Double)]): List[ZigzagRenko.StCore] = {
    val init = ZigzagRenko.stInit(feed.head._1, feed.head._2, feed.head._3)
    feed.tail.scanLeft(init) { case (st, (c, ub, lb)) =>
      ZigzagRenko.stStep(st, c, ub, lb)
    }
  }

  test("supertrend: bands ratchet — fu never rises and fl never falls without a breakout") {
    forAllSampled(stSeries) { feed =>
      runSt(feed).sliding(2).zip(feed.tail.iterator).foreach {
        case (Seq(prev, cur), (_, ub, lb)) =>
          if (prev.prevClose <= prev.fu)
            assert(cur.fu <= prev.fu, s"fu rose ${prev.fu} -> ${cur.fu} without breakout")
          else assert(cur.fu == ub, s"breakout fu ${cur.fu} != raw band $ub")
          if (prev.prevClose >= prev.fl)
            assert(cur.fl >= prev.fl, s"fl fell ${prev.fl} -> ${cur.fl} without breakout")
          else assert(cur.fl == lb, s"breakout fl ${cur.fl} != raw band $lb")
          assert(cur.fu == ub || cur.fu == prev.fu, "fu is neither raw nor held")
          assert(cur.fl == lb || cur.fl == prev.fl, "fl is neither raw nor held")
        case _ =>
      }
    }
  }

  test("supertrend: the side flips exactly when the close crosses the post-update band") {
    forAllSampled(stSeries) { feed =>
      runSt(feed).sliding(2).zip(feed.tail.iterator).foreach {
        case (Seq(prev, cur), (close, _, _)) =>
          val expected = if (prev.isu) close <= cur.fu else close < cur.fl
          assert(cur.isu == expected,
            s"side ${cur.isu}, close $close vs fu ${cur.fu} / fl ${cur.fl}")
        case _ =>
      }
    }
  }

  test("supertrend: held bands are always raw band values the feed actually produced") {
    forAllSampled(stSeries) { feed =>
      val ubs = feed.map(_._2).toSet
      val lbs = feed.map(_._3).toSet
      runSt(feed).foreach { st =>
        assert(ubs.contains(st.fu), s"fu ${st.fu} never a raw upper band")
        assert(lbs.contains(st.fl), s"fl ${st.fl} never a raw lower band")
      }
    }
  }

  // -------------------------------------------------------------- backtest
  /** Signal/price feed: signals fire often enough to open and flip
    * trades; crash/spike steps trigger the 5% stop-loss from both
    * sides. */
  private val btSeries: Gen[List[(Int, Double)]] = for {
    prices  <- priceSeries
    signals <- Gen.listOfN(prices.size, Gen.frequency(
      5 -> Gen.const(0), 2 -> Gen.const(1), 2 -> Gen.const(-1)))
  } yield signals.zip(prices)

  private def ts(i: Int) = new java.sql.Timestamp(1700000040000L + i * 60000L)

  /** Run the fold, tracking for each emitted trade whether its exit row
    * was a force-close and what the exit row's signal was. */
  private def runBt(feed: List[(Int, Double)])
      : (Seq[(Stateful.BtTrade, Int, Boolean)], Stateful.BtCore) = {
    var core = Stateful.btInit
    val out = Seq.newBuilder[(Stateful.BtTrade, Int, Boolean)]
    feed.zipWithIndex.foreach { case ((sig, px), i) =>
      val (nc, t) = Stateful.btStep(core, sig, ts(i), px)
      core = nc
      t.foreach(bt => out += ((bt, sig, false)))
    }
    val (fin, t) = Stateful.btFinish(core, ts(feed.size - 1), feed.last._2)
    t.foreach(bt => out += ((bt, feed.last._1, true)))
    (out.result(), fin)
  }

  test("backtest: trades are well-formed and never overlap (max_positions = 1)") {
    forAllSampled(btSeries) { feed =>
      val (trades, fin) = runBt(feed)
      assert(fin.open.isEmpty, "position still open after finish")
      trades.map(_._1).foreach { t =>
        assert(!t.exitTime.before(t.entryTime), "exit before entry")
        assert(t.size > 0, s"non-positive size ${t.size}")
        // 1 bp per side on the same size: commission is exactly twice
        // the entry half (x + x is exact in IEEE)
        assert(t.commission == 2 * (t.size * 0.0001),
          s"commission ${t.commission} != 2 sides of 1 bp on ${t.size}")
      }
      trades.map(_._1).sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.entryTime.after(a.exitTime),
            s"overlapping trades: entry ${b.entryTime} <= prior exit ${a.exitTime}")
        case _ =>
      }
    }
  }

  test("backtest: every exit is an opposite signal, a 5% stop, or the force-close") {
    forAllSampled(btSeries) { feed =>
      runBt(feed)._1.foreach { case (t, exitSig, forced) =>
        val opposite =
          if (t.tradeType == "buy") exitSig < 0 else exitSig > 0
        val stop =
          if (t.tradeType == "buy") t.exitPrice <= t.entryPrice * 0.95
          else t.exitPrice >= t.entryPrice * 1.05
        assert(forced || opposite || stop,
          s"trade closed with no exit condition: $t signal $exitSig")
      }
    }
  }

  test("backtest: the capital trajectory replays as 10% sizing, 1 bp debits, pnl credits") {
    forAllSampled(btSeries) { feed =>
      val (trades, fin) = runBt(feed)
      var capital = Stateful.btInit.capital
      trades.map(_._1).foreach { t =>
        assert(t.size == capital * 0.1,
          s"size ${t.size} != 10% of capital-at-entry $capital")
        capital -= t.size * 0.0001 // entry commission debit
        capital += t.pnl           // pnl (net of BOTH commission halves)
        // solvency guard: an entry only ever happened with capital > 0
        assert(t.size > 0)
      }
      assert(capital == fin.capital,
        s"replayed capital $capital != fold capital ${fin.capital}")
    }
  }

  test("backtest: pnl and return carry the trade direction") {
    forAllSampled(btSeries) { feed =>
      runBt(feed)._1.map(_._1).foreach { t =>
        val favorable =
          if (t.tradeType == "buy") t.exitPrice > t.entryPrice
          else t.exitPrice < t.entryPrice
        if (t.pnl > 0) assert(favorable, s"positive pnl on adverse move: $t")
        if (favorable)
          assert(t.returnPct > 0, s"favorable move with non-positive return: $t")
      }
    }
  }
}
