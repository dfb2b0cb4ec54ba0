package graft.operators

import graft.SparkSpec
import graft.analysis.Stateful

/** W38 Ichimoku + W39 Heikin-Ashi: geometry and displacement invariants
  * checked against direct local recomputation from the same candles. */
class IndicatorExtSpec extends SparkSpec {

  private lazy val byUser: Map[Long, Seq[(Long, Double, Double, Double, Double)]] =
    Stateful.candleDs(spark, sfDir).collect()
      .groupBy(_.user_id)
      .map { case (k, rows) =>
        k -> rows.sortBy(_.bucket.getTime).toSeq
          .map(r => (r.bucket.getTime, r.open, r.high, r.low, r.close))
      }

  test("ichimoku lines match local rolling midpoints and displacement") {
    val got = Windows.w38Ichimoku(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(4)).map(_.asInstanceOf[Double]),
         Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      val n = rows.length
      def mid(i: Int, p: Int): Option[Double] =
        if (i < p - 1) None
        else {
          val w = rows.slice(i - p + 1, i + 1)
          Some((w.map(_._3).max + w.map(_._4).min) / 2)
        }
      for (i <- 0 until n) {
        val (ts, _, _, _, _) = rows(i)
        val (tenkan, senkouA, chikou) = got((uid, ts))
        // tenkan = 9-period midpoint (warmup rows null)
        (tenkan, mid(i, 9)) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-5, s"tenkan $uid@$i")
          case (None, None)       => ()
          case other              => fail(s"tenkan null mismatch $uid@$i: $other")
        }
        // senkou A at i = midpoint-of-(tenkan,kijun) computed 26 rows back
        val expA = if (i < 26) None
          else for (t <- mid(i - 26, 9); k <- mid(i - 26, 26)) yield (t + k) / 2
        (senkouA, expA) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-5, s"senkouA $uid@$i")
          case (None, None)       => ()
          case other              => fail(s"senkouA null mismatch $uid@$i: $other")
        }
        // chikou = close displaced backward
        val expC = if (i + 26 < n) Some(rows(i + 26)._5) else None
        (chikou, expC) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-5, s"chikou $uid@$i")
          case (None, None)       => ()
          case other              => fail(s"chikou null mismatch $uid@$i: $other")
        }
      }
    }
  }

  test("pivot points derive from yesterday's daily OHLC per key") {
    val dayMs = 86400000L
    val daily: Map[(Long, Long), (Double, Double, Double)] =
      byUser.toSeq.flatMap { case (uid, rows) =>
        rows.groupBy(_._1 / dayMs).map { case (d, rs) =>
          (uid, d) -> (rs.map(_._3).max, rs.map(_._4).min, rs.maxBy(_._1)._5)
        }
      }.toMap
    val got = WindowsAdvanced.w40PivotPoints(spark, sfDir).collect()
    assert(got.nonEmpty)
    var checked = 0
    got.foreach { r =>
      val uid = r.getLong(0)
      val day = r.getTimestamp(1).getTime / dayMs
      // lag(1) over the per-key daily frame = the LATEST prior day with data
      val prevDays = daily.keys.collect { case (u, d) if u == uid && d < day => d }
      if (prevDays.nonEmpty) {
        val (h, l, c) = daily((uid, prevDays.max))
        val p = (h + l + c) / 3
        assert(math.abs(r.getDouble(3) - p) < 1e-5, s"pivot $uid@$day")
        assert(math.abs(r.getDouble(4) - (2 * p - l)) < 1e-5, s"r1 $uid@$day")
        assert(math.abs(r.getDouble(5) - (2 * p - h)) < 1e-5, s"s1 $uid@$day")
        assert(math.abs(r.getDouble(6) - (p + (h - l))) < 1e-5, s"r2 $uid@$day")
        assert(math.abs(r.getDouble(7) - (p - (h - l))) < 1e-5, s"s2 $uid@$day")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("heikin-ashi matches the local recurrence and brackets the body") {
    val got = Stateful.heikinAshi(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      var prevO = 0.0; var prevC = 0.0
      rows.zipWithIndex.foreach { case ((ts, o, h, l, c), i) =>
        val haC = (o + h + l + c) / 4
        val haO = if (i == 0) (o + c) / 2 else (prevO + prevC) / 2
        prevO = haO; prevC = haC
        val (gO, gH, gL, gC, bull) = got((uid, ts))
        assert(math.abs(gO - haO) < 1e-5, s"ha_open $uid@$i")
        assert(math.abs(gC - haC) < 1e-5, s"ha_close $uid@$i")
        // high/low clamp the synthetic body and the raw extremes
        assert(gH + 1e-9 >= math.max(gO, gC) && gH + 1e-9 >= h - 1e-5)
        assert(gL - 1e-9 <= math.min(gO, gC) && gL - 1e-9 <= l + 1e-5)
        assert(bull == (haC > haO) ||
          math.abs(haC - haO) < 1e-9) // boundary rows: either direction ok
      }
    }
  }
}
