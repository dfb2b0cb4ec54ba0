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
}
