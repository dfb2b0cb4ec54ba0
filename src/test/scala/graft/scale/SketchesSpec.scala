package graft.scale

import graft.SparkSpec

/** The Count-Min ε-band lives here, not in the DuckDB oracle: the
  * upper bound est ≤ exact + ε·N holds with probability 1−δ per item,
  * so it is a property of this fixed (fixture, seed) pair — pinning
  * TRUE in a hash-compared oracle would turn a legitimate probabilistic
  * miss into a correctness failure. The deterministic guarantee
  * (est ≥ exact, counters only over-count) stays oracle-checked in
  * `sk_heavy_hitters_cms`. */
class SketchesSpec extends SparkSpec {

  test("CMS estimates over-count and stay inside the eps band on the fixed fixture") {
    val band = Sketches.cmsErrorBand(spark, sfDir)
    assert(band.size == 20)
    band.foreach { case (s, exact, est, slack) =>
      assert(est >= exact, s"'$s': CMS must never under-count ($est < $exact)")
      assert(est <= exact + slack,
        s"'$s': est $est exceeds exact $exact + eps*N $slack on the fixed seed/fixture")
    }
  }
}
