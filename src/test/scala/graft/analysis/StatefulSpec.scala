package graft.analysis

import graft.SparkSpec

/** PSAR and backtest fold vs direct single-threaded re-implementations of
  * the reference algorithms (`advanced_feature_engineer.py:171-208`,
  * `backtesting_engine.py:284-379`) — validates the Spark
  * flatMapSortedGroups plumbing (secondary sort, key isolation, state
  * reset between keys). */
class StatefulSpec extends SparkSpec {

  private def candlesLocal(): Map[Long, Seq[(java.sql.Timestamp, Double, Double, Double, Double)]] =
    Stateful.candleDs(spark, sfDir).collect()
      .groupBy(_.user_id)
      .map { case (k, rows) =>
        k -> rows.sortBy(_.bucket.getTime).toSeq
          .map(r => (r.bucket, r.open, r.high, r.low, r.close))
      }

  test("psar matches the reference state machine per key") {
    val expected = candlesLocal().flatMap { case (uid, rows) =>
      // direct port of the reference loop
      val high = rows.map(_._3).toArray
      val low = rows.map(_._4).toArray
      val psar = new Array[Double](rows.length)
      var bull = true; var af = 0.02
      var ep = low(0); psar(0) = high(0)
      for (i <- 1 until rows.length) {
        psar(i) = psar(i - 1) + af * (ep - psar(i - 1))
        if (bull) {
          if (low(i) <= psar(i)) { bull = false; psar(i) = ep; af = 0.02; ep = low(i) }
          else if (high(i) > ep) { ep = high(i); af = math.min(af + 0.02, 0.2) }
        } else {
          if (high(i) >= psar(i)) { bull = true; psar(i) = ep; af = 0.02; ep = high(i) }
          else if (low(i) < ep) { ep = low(i); af = math.min(af + 0.02, 0.2) }
        }
      }
      rows.indices.map(i => (uid, rows(i)._1.getTime) -> psar(i))
    }
    val got = Stateful.psar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) -> r.getDouble(2)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, e) =>
      assert(math.abs(got(k) - e) < 1e-5, s"key $k: ${got(k)} vs $e")
    }
  }

  test("backtest trades balance: pnl = gross - commission, exits follow entries") {
    val trades = Stateful.backtestTrades(spark, sfDir).collect()
    assert(trades.nonEmpty)
    trades.foreach { r =>
      val entry = r.getTimestamp(1); val exit = r.getTimestamp(2)
      assert(!exit.before(entry))
      val entryP = r.getDouble(3); val exitP = r.getDouble(4)
      val tpe = r.getString(5); val size = r.getDouble(6)
      val commission = r.getDouble(7); val pnl = r.getDouble(8)
      val gross = if (tpe == "buy") (exitP - entryP) * size else (entryP - exitP) * size
      assert(math.abs(pnl - (gross - commission)) < 1e-4, s"pnl mismatch: $r")
    }
    // max_positions=1: no overlapping trades per user
    trades.groupBy(_.getLong(0)).values.foreach { ts =>
      val sorted = ts.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b.getTimestamp(1).before(a.getTimestamp(2)),
            s"overlapping trades for user ${a.getLong(0)}")
        case _ =>
      }
    }
  }

  test("RSI and MACD strategies run through the same executor with the same invariants") {
    // sf0.01: sf0.001's ~60-candle series never cross the RSI 30/70 bands
    val dir = "/root/testdata/sf0.01"
    for (trades <- Seq(Stateful.backtestTradesRsi(spark, dir).collect(),
                       Stateful.backtestTradesMacd(spark, dir).collect())) {
      assert(trades.nonEmpty)
      trades.foreach { r =>
        assert(!r.getTimestamp(2).before(r.getTimestamp(1)))
        assert(r.getDouble(6) > 0, s"non-positive size: $r")
        val gross =
          if (r.getString(5) == "buy") (r.getDouble(4) - r.getDouble(3)) * r.getDouble(6)
          else (r.getDouble(3) - r.getDouble(4)) * r.getDouble(6)
        // tolerance scales with pnl: prices are rounded to 1e-6 and sizes
        // reach 1e4, so the recomputed gross carries ~|size|·1e-6 noise
        assert(math.abs(r.getDouble(8) - (gross - r.getDouble(7))) <
          1e-4 * math.max(1.0, math.abs(r.getDouble(8))), r.toString)
      }
      trades.groupBy(_.getLong(0)).values.foreach { ts =>
        ts.sortBy(_.getTimestamp(1).getTime).sliding(2).foreach {
          case Array(a, b) => assert(!b.getTimestamp(1).before(a.getTimestamp(2)))
          case _ =>
        }
      }
    }
  }
}
