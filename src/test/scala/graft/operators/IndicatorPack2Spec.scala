package graft.operators

import graft.SparkSpec
import graft.analysis.Stateful

/** W44 (MFI/CMF) + W45 (TRIX/Vortex) against direct local
  * recomputation from the same candles — the windowed-SQL path and a
  * straight-line Scala fold must agree to 1e-6 on every row, and the
  * bounded oscillators must respect their ranges. */
class IndicatorPack2Spec extends SparkSpec {

  private lazy val byUser: Map[Long, Seq[(Long, Double, Double, Double, Double, Double)]] =
    Stateful.candleDs(spark, sfDir).collect()
      .groupBy(_.user_id)
      .map { case (k, rows) =>
        k -> rows.sortBy(_.bucket.getTime).toSeq
          .map(r => (r.bucket.getTime, r.open, r.high, r.low, r.close, r.volume.toDouble))
      }

  private def near(g: Option[Double], e: Option[Double], tag: String): Unit =
    (g, e) match {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-5, s"$tag: $a vs $b")
      case (None, None)       => ()
      case other              => fail(s"$tag null mismatch: $other")
    }

  test("MFI-14 and CMF-20 match local recomputation; ranges hold") {
    val got = IndicatorPack2.w44MoneyFlow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (mfi, cmf) =>
      mfi.foreach(v => assert(v >= 0 && v <= 100, s"MFI out of range: $v"))
      cmf.foreach(v => assert(v >= -1 - 1e-9 && v <= 1 + 1e-9, s"CMF out of range: $v"))
    }
    byUser.foreach { case (uid, rows) =>
      val tp = rows.map(r => (r._3 + r._4 + r._5) / 3.0)
      val vol = rows.map(_._6)
      for (i <- rows.indices) {
        val expMfi =
          if (i < 14) None
          else {
            val idx = (i - 13) to i
            val pos = idx.map(j => if (tp(j) > tp(j - 1)) tp(j) * vol(j) else 0.0).sum
            val neg = idx.map(j => if (tp(j) < tp(j - 1)) tp(j) * vol(j) else 0.0).sum
            if (pos + neg == 0) None else Some(rnd6(100.0 * pos / (pos + neg)))
          }
        val expCmf =
          if (i < 19) None
          else {
            val idx = (i - 19) to i
            val mfv = idx.map { j =>
              val (_, _, h, l, c, v) = rows(j)
              if (h != l) (c - l - (h - c)) / (h - l) * v else 0.0
            }.sum
            val vs = idx.map(vol).sum
            if (vs == 0) None else Some(rnd6(mfv / vs))
          }
        val (mfi, cmf) = got((uid, rows(i)._1))
        near(mfi, expMfi, s"mfi $uid@$i")
        near(cmf, expCmf, s"cmf $uid@$i")
      }
    }
  }

  test("TRIX-15 and Vortex-14 match local recomputation") {
    val got = IndicatorPack2.w45TrixVortex(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got.nonEmpty)
    byUser.foreach { case (uid, rows) =>
      // adjust=True ewm via normalized weights, the EwmAvg contract
      def ewm(xs: Seq[Double], span: Int): Seq[Double] = {
        val a = 2.0 / (span + 1)
        var num = 0.0; var den = 0.0
        xs.map { x =>
          num = num * (1 - a) + x
          den = den * (1 - a) + 1.0
          num / den
        }
      }
      val close = rows.map(_._5)
      val e3 = ewm(ewm(ewm(close, 15), 15), 15)
      for (i <- rows.indices) {
        val (ts, _, h, l, _, _) = rows(i)
        val (trix, vip, vim) = got((uid, ts))
        val expTrix =
          if (i == 0 || e3(i - 1) == 0) None
          else Some(rnd6(100.0 * (e3(i) - e3(i - 1)) / e3(i - 1)))
        near(trix, expTrix, s"trix $uid@$i")
        val expVi =
          if (i < 14) (None, None)
          else {
            val idx = (i - 13) to i
            val tr = idx.map { j =>
              math.max(rows(j)._3, rows(j - 1)._5) - math.min(rows(j)._4, rows(j - 1)._5)
            }.sum
            val p = idx.map(j => math.abs(rows(j)._3 - rows(j - 1)._4)).sum
            val m = idx.map(j => math.abs(rows(j)._4 - rows(j - 1)._3)).sum
            if (tr == 0) (None, None) else (Some(rnd6(p / tr)), Some(rnd6(m / tr)))
          }
        near(vip, expVi._1, s"vi+ $uid@$i")
        near(vim, expVi._2, s"vi- $uid@$i")
      }
    }
  }

  private def rnd6(v: Double): Double = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
}
