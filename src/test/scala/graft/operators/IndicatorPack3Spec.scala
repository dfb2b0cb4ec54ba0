package graft.operators

import graft.SparkSpec
import graft.analysis.Stateful

/** W46 (KAMA), W49 (GARCH vol), W50 (range-vol estimators) against
  * straight-line local recomputation from the same candles — the
  * distributed fold/window path and an obviously-correct sequential
  * Scala pass must agree to 1e-5 on every row. An independent anchor
  * beside the DuckDB oracle: the oracle proves both ENGINES compute
  * the same thing; this proves the thing computed is the textbook
  * definition. */
class IndicatorPack3Spec extends SparkSpec {

  private lazy val byUser: Map[Long, Seq[(Long, Double, Double, Double, Double)]] =
    Stateful.candleDs(spark, sfDir).collect()
      .groupBy(_.user_id)
      .map { case (k, rows) =>
        k -> rows.sortBy(_.bucket.getTime).toSeq
          .map(r => (r.bucket.getTime, r.open, r.high, r.low, r.close))
      }

  private def rnd6(v: Double): Double = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def near(g: Option[Double], e: Option[Double], tag: String): Unit =
    (g, e) match {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-5, s"$tag: $a vs $b")
      case (None, None)       => ()
      case other              => fail(s"$tag null mismatch: $other")
    }

  test("KAMA-10/2/30 matches local recomputation; kama stays inside [prev, close]") {
    val got = IndicatorPack3.w46Kama(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      val close = rows.map(_._5)
      var kama = 0.0
      var seeded = false
      for (i <- rows.indices) {
        if (i >= 10) {
          val vol = (i - 9 to i).map(j => math.abs(close(j) - close(j - 1))).sum
          val change = math.abs(close(i) - close(i - 10))
          val er = if (vol != 0) change / vol else 0.0
          val sc = {
            val t = er * (2.0 / 3.0 - 2.0 / 31.0) + 2.0 / 31.0
            t * t
          }
          val prev = kama
          if (!seeded) { kama = close(i); seeded = true }
          else kama = kama + sc * (close(i) - kama)
          // the adaptive update is a convex combination: sc in (0, 1]
          if (i > 10) {
            val lo = math.min(prev, close(i)) - 1e-9
            val hi = math.max(prev, close(i)) + 1e-9
            assert(kama >= lo && kama <= hi, s"kama escaped [$lo,$hi]: $kama")
          }
          val (gotEr, gotKama) = got((uid, rows(i)._1))
          near(Some(gotEr), Some(rnd6(er)), s"er $uid@$i")
          near(Some(gotKama), Some(rnd6(kama)), s"kama $uid@$i")
        } else assert(!got.contains((uid, rows(i)._1)), s"warmup row emitted $uid@$i")
      }
    }
  }

  test("GARCH(1,1) vol matches local recomputation and is strictly positive") {
    val got = IndicatorPack3.w49GarchVol(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      val close = rows.map(_._5)
      var s2 = 0.0
      var prevR = 0.0
      var seeded = false
      for (i <- 1 until rows.length) {
        val r = (close(i) - close(i - 1)) / close(i - 1)
        if (!seeded) { s2 = r * r; seeded = true }
        else s2 = 2.0e-8 + 0.06 * (prevR * prevR) + 0.92 * s2
        prevR = r
        assert(s2 >= 0, s"negative variance $s2")
        val (gotR, gotVol) = got((uid, rows(i)._1))
        near(Some(gotR), Some(rnd6(r)), s"ret $uid@$i")
        near(Some(gotVol), Some(rnd6(10000.0 * math.sqrt(s2))), s"vol $uid@$i")
        assert(gotVol > 0, s"vol not positive: $gotVol")
      }
    }
  }

  test("w49/w50 zero-price bars: return after a zero close is skipped (state persists); windows touching the bar are null") {
    val dir = graft.ZeroBarFixture.dir(spark)
    val bars = graft.ZeroBarFixture.bars
    val close = bars.map(_._5)

    // --- w49: local replay of the pinned rule (null return => skip)
    var s2 = 0.0; var prevR = 0.0; var seeded = false
    val exp49 = scala.collection.mutable.LinkedHashMap.empty[Long, (Double, Double)]
    for (i <- 1 until bars.length) {
      if (close(i - 1) != 0) {
        val r = (close(i) - close(i - 1)) / close(i - 1)
        if (!seeded) { s2 = r * r; seeded = true }
        else s2 = 2.0e-8 + 0.06 * (prevR * prevR) + 0.92 * s2
        prevR = r
        exp49(bars(i)._1) = (rnd6(r), rnd6(10000.0 * math.sqrt(s2)))
      } // bar after the zero close: undefined return, state persists
    }
    val got49 = IndicatorPack3.w49GarchVol(spark, dir).collect()
      .map(r => r.getTimestamp(1).getTime -> (r.getDouble(2), r.getDouble(3))).toMap
    // the zero-close bar itself is a real (−100%) return row; the NEXT bar is skipped
    assert(got49.contains(bars(5)._1), "zero-close bar's own return must emit")
    assert(!got49.contains(bars(6)._1), "return off a zero close must be skipped")
    assert(got49.keySet == exp49.keySet.toSet)
    exp49.foreach { case (t, (er, ev)) =>
      near(Some(got49(t)._1), Some(er), s"w49 ret @$t")
      near(Some(got49(t)._2), Some(ev), s"w49 vol @$t")
    }

    // --- w50: the invalid bar's terms are null, so every 20-bar window
    // touching it is null via the count guard; later windows recover
    val L2 = 0.6931471805599453
    def terms(f: (Double, Double, Double, Double) => Double): Seq[Option[Double]] =
      bars.map { case (_, o, h, l, c) =>
        if (o > 0 && h > 0 && l > 0 && c > 0) Some(f(o, h, l, c)) else None
      }
    val pk = terms((_, h, l, _) => { val x = math.log(h / l); x * x / (4 * L2) })
    val gk = terms((o, h, l, c) => {
      val x = math.log(h / l); val y = math.log(c / o)
      0.5 * x * x - (2 * L2 - 1) * y * y
    })
    val rs = terms((o, h, l, c) =>
      math.log(h / c) * math.log(h / o) + math.log(l / c) * math.log(l / o))
    def vol(ts: Seq[Option[Double]], i: Int): Option[Double] =
      if (i < 19) None
      else {
        val win = (i - 19 to i).map(ts)
        if (win.exists(_.isEmpty)) None
        else Some(rnd6(math.sqrt(win.flatten.sum / 20.0) * 10000.0))
      }
    val got50 = IndicatorPack3.w50RangeVol(spark, dir).collect()
      .map(r => r.getTimestamp(1).getTime ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    for (i <- bars.indices) {
      val (gp, gg, gr) = got50(bars(i)._1)
      near(gp, vol(pk, i), s"w50 parkinson @$i")
      near(gg, vol(gk, i), s"w50 gk @$i")
      near(gr, vol(rs, i), s"w50 rs @$i")
      if (i >= 19 && i <= 24) assert(gp.isEmpty, s"window touching the zero bar must be null @$i")
      if (i >= 25) assert(gp.nonEmpty, s"window past the zero bar must recover @$i")
    }
  }

  test("range-vol estimators match local recomputation; Parkinson is non-negative") {
    val L2 = 0.6931471805599453
    val got = IndicatorPack3.w50RangeVol(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      val pk = rows.map { case (_, _, h, l, _) => val x = math.log(h / l); x * x }
      val gk = rows.map { case (_, o, h, l, c) =>
        val x = math.log(h / l); val y = math.log(c / o)
        0.5 * x * x - (2 * L2 - 1) * y * y
      }
      val rs = rows.map { case (_, o, h, l, c) =>
        math.log(h / c) * math.log(h / o) + math.log(l / c) * math.log(l / o)
      }
      for (i <- rows.indices) {
        def vol(terms: Seq[Double]): Option[Double] =
          if (i < 19) None
          else Some(rnd6(math.sqrt((i - 19 to i).map(terms).sum / 20.0) * 10000.0))
        val (gp, gg, gr) = got((uid, rows(i)._1))
        near(gp, vol(pk.map(_ / (4 * L2))), s"parkinson $uid@$i")
        near(gg, vol(gk), s"gk $uid@$i")
        near(gr, vol(rs), s"rs $uid@$i")
        gp.foreach(v => assert(v >= 0, s"negative parkinson $v"))
      }
    }
  }
}
