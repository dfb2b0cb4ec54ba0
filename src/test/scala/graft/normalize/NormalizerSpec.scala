package graft.normalize

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 plan): normalization round-trips through
  * invert; dedup is idempotent; OHLC repair establishes its invariant.
  * (scalatestplus isn't in the offline cache, so ScalaCheck generators
  * are sampled directly with fixed seeds.) */
class NormalizerSpec extends SparkSpec {

  private val series = Gen.nonEmptyListOf(Gen.choose(-1e4, 1e4)).suchThat(_.size >= 3)

  private def forAllSampled[T](gen: Gen[T], n: Int = 12)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("apply then invert restores original values for all three methods") {
    import spark.implicits._
    forAllSampled(series) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
      for (m <- Seq(Normalizer.MinMax, Normalizer.ZScore, Normalizer.Robust)) {
        val params = Normalizer.fit(df, Seq("x"), m)
        val normed = Normalizer.apply(df, Seq("x"), m)
        val restored = Normalizer.invert(normed, params, Seq("x"), m)
          .orderBy("id").select("x").collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
        val orig = df.orderBy("id").select("x").collect().map(_.getDouble(0))
        restored.zip(orig).foreach {
          case (Some(r), o) => assert(math.abs(r - o) <= 1e-9 * math.max(1.0, math.abs(o)),
            s"$m: $r vs $o")
          case (None, o) =>
            // degenerate fit (constant series / zero spread) normalizes to
            // null — the reference skips those columns the same way
            assert(xs.max == xs.min || m != Normalizer.MinMax)
        }
      }
    }
  }

  test("dedup is idempotent") {
    val d1 = graft.scale.Dedup.dedupExact(spark, sfDir)
    assert(d1.count() == d1.distinct().count())
    val again = d1.groupBy("content_hash").count().filter("count > 1").count()
    assert(again == 0)
  }

  test("OHLC repair establishes high >= max(open,close) >= min(open,close) >= low") {
    val repaired = graft.operators.QualityOps.qcOhlcRepair(spark, sfDir)
    val bad = repaired.filter(
      "high_fixed < greatest(0, 0) + 0 or high_fixed < low_fixed").count()
    assert(bad == 0)
    val violations = graft.Tables.candles(spark, sfDir)
      .join(repaired, Seq("user_id", "bucket"))
      .filter("high_fixed < greatest(open, close) OR low_fixed > least(open, close)")
      .count()
    assert(violations == 0)
  }
}
