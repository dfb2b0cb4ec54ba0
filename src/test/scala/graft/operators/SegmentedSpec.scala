package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmented single-key windows (SURVEY §7.5 scale mitigation): the
  * N-way-parallel plan must be value-identical to the naive
  * single-partition window, and must actually partition by segment. */
class SegmentedSpec extends SparkSpec {

  // the whole events table as one unkeyed series — the single-symbol case
  private def series = Tables.events(spark, sfDir)
    .select(col("event_id"), col("ts"), col("value"))

  test("segmented SMA/max equals the single-partition window") {
    // 2 segments here (≈3000 rows each at sf0.001) — the query surface
    // uses 8; both satisfy rows-per-segment ≥ lookback
    val seg = Segmented.segmented(series, "ts", "event_id", 19, 2) { (d, w) =>
      val w20 = w.rowsBetween(-19, 0)
      d.withColumn("sma_20",
          when(count(col("value")).over(w20) === 20, round(avg(col("value")).over(w20), 6)))
        .withColumn("max_20",
          when(count(col("value")).over(w20) === 20, round(max(col("value")).over(w20), 6)))
    }.select(col("event_id"), col("sma_20"), col("max_20"))
      .orderBy("event_id").collect()
    val w20 = Window.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val naive = series
      .withColumn("sma_20",
        when(count(col("value")).over(w20) === 20, round(avg(col("value")).over(w20), 6)))
      .withColumn("max_20",
        when(count(col("value")).over(w20) === 20, round(max(col("value")).over(w20), 6)))
      .select(col("event_id"), col("sma_20"), col("max_20"))
      .orderBy("event_id").collect()
    assert(seg.length == naive.length && seg.length > 20)
    assert(naive.exists(_.get(1) != null)) // non-vacuous: some frames filled
    seg.zip(naive).foreach { case (s, n) => assert(s == n, s"$s vs $n") }
  }

  test("the window exchange hashes on the segment column, not a single key") {
    val plan = Segmented.w3SmaSegmented(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__seg"), plan.take(2000))
  }

  test("segmented EMA equals the serial EwmAvg scan over the whole series") {
    graft.functions.GraftFunctions.register(spark)
    val seg = Segmented.w3SmaSegmented(spark, sfDir) // warm tables
    val parallel = Segmented.emaSegmented(series, "ts", "event_id", "value", 20, 8)
      .select(col("event_id"), col("__ema")).orderBy("event_id").collect()
    val wAll = Window.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val serial = series
      .withColumn("ema", graft.functions.GraftFunctions.ewmAvgSpan(col("value"), 20).over(wAll))
      .select(col("event_id"), col("ema")).orderBy("event_id").collect()
    assert(parallel.length == serial.length && parallel.length >= 1000)
    parallel.zip(serial).foreach { case (p, s) =>
      val (pe, se) = (p.getDouble(1), s.getDouble(1))
      assert(math.abs(pe - se) <= 1e-9 * math.max(1.0, math.abs(se)),
        s"event ${p.getLong(0)}: $pe vs $se")
    }
  }

  test("lookback shorter than the frame breaks the invariant (guard works)") {
    // sanity check of the test itself: with lookback 0 the boundary rows
    // lose their history, so results MUST differ from the naive window —
    // proving the equality above is non-vacuous
    val broken = Segmented.segmented(series, "ts", "event_id", 0, 2) { (d, w) =>
      d.withColumn("sma_20",
        when(count(col("value")).over(w.rowsBetween(-19, 0)) === 20,
          round(avg(col("value")).over(w.rowsBetween(-19, 0)), 6)))
    }.select(col("event_id"), col("sma_20")).orderBy("event_id").collect()
    val w20 = Window.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val naive = series
      .withColumn("sma_20",
        when(count(col("value")).over(w20) === 20, round(avg(col("value")).over(w20), 6)))
      .select(col("event_id"), col("sma_20")).orderBy("event_id").collect()
    assert(broken.zip(naive).exists { case (b, n) => b != n })
  }
}
