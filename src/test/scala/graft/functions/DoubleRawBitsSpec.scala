package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The packed-argmin machinery behind every IVF/PQ/k-means assignment:
  * `min(packOrdId(dist, cid))` must pick exactly the
  * `ORDER BY dist, cid LIMIT 1` row per group — the lexicographic
  * contract the DuckDB oracles verify end-to-end — and must plan as a
  * HashAggregate (the whole point: `min(struct(...))` is a
  * SortAggregate, the sf10 spill finding). */
class DoubleRawBitsSpec extends SparkSpec {

  private def forAllSampled[T](gen: Gen[T], n: Int = 200)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(4200L + i)).foreach(body)
    }

  /** Non-negative doubles across the full dynamic range squared
    * distances can hit: zero, subnormals, tiny, ordinary, huge. */
  private val nonNegDouble: Gen[Double] = Gen.frequency(
    1 -> Gen.const(0.0),
    1 -> Gen.const(java.lang.Double.MIN_VALUE),
    1 -> Gen.const(java.lang.Double.MAX_VALUE),
    4 -> Gen.choose(0.0, 1e-12),
    8 -> Gen.choose(0.0, 1e6),
    4 -> Gen.choose(1e6, 1e300))

  test("packing preserves lexicographic (ord, id) order — sampled across the double range") {
    val pairGen = for {
      d1 <- nonNegDouble; d2 <- nonNegDouble
      i1 <- Gen.choose(0L, (1L << 32) - 1); i2 <- Gen.choose(0L, (1L << 32) - 1)
    } yield (d1, i1, d2, i2)
    def pack(d: Double, i: Long): BigInt =
      (BigInt(java.lang.Double.doubleToRawLongBits(d)) << 32) + i
    forAllSampled(pairGen) { case (d1, i1, d2, i2) =>
      val lex = if (d1 != d2) d1 < d2 else i1 < i2
      val packLt = pack(d1, i1) < pack(d2, i2)
      assert(lex == packLt || (d1 == d2 && i1 == i2),
        s"pack order diverged from lexicographic at ($d1,$i1) vs ($d2,$i2)")
    }
  }

  test("min(packOrdId) equals the rank-1 window argmin on a grouped frame, ties by id") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // groups with exact double TIES across different ids — the case
    // where min_by would be nondeterministic and the pack must fall
    // back to smallest id, matching ORDER BY d, cid LIMIT 1
    val rows = Seq(
      (1L, 0.25, 7L), (1L, 0.25, 3L), (1L, 0.30, 1L),
      (2L, 0.0, 5L), (2L, java.lang.Double.MIN_VALUE, 0L),
      (3L, 1e300, 2L), (3L, 1e300, 9L), (3L, 1e299, 8L))
      .toDF("g", "d", "cid")
    val packed = rows.groupBy($"g")
      .agg(min(GraftFunctions.packOrdId($"d", $"cid")).as("p"))
      .select($"g", GraftFunctions.packedId($"p").as("cid"))
      .orderBy($"g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(packed.toSeq == Seq((1L, 3L), (2L, 5L), (3L, 8L)))
  }

  test("the packed argmin plans as a HashAggregate, not a SortAggregate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.range(0, 1000)
      .select(($"id" % 100).as("g"), ($"id" % 7).cast("double").as("d"), $"id".as("cid"))
      .groupBy($"g").agg(min(GraftFunctions.packOrdId($"d", $"cid")).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // and the struct form really is the sort fallback (the defect this
    // pack exists to dodge — if Spark ever learns to hash struct
    // buffers this assertion flags the pack as removable)
    val structForm = spark.range(0, 1000)
      .select(($"id" % 100).as("g"), ($"id" % 7).cast("double").as("d"), $"id".as("cid"))
      .groupBy($"g").agg(min(struct($"d", $"cid")).as("m"))
    assert(structForm.queryExecution.executedPlan.toString.contains("SortAggregate"))
  }
}
