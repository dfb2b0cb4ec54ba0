package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality operators — SURVEY §2.3/§2.6/§2.7: OHLC repair, the W37
  * gap-interpolation fill, and the validator's quality score.
  */
object QualityOps {

  // ---------------------------------------------------------------- repair
  /** OHLC consistency repair (`data_quality.py:417-458`): clamp
    * high/low to cover open/close, flag repaired rows. Pure map stage. */
  def qcOhlcRepair(spark: SparkSession, dir: String): DataFrame = {
    // Derive deliberately-inconsistent candles by swapping high/low for a
    // deterministic subset, then repair — exercises the repair path on
    // real data without mutating the source (the testdata has no
    // inconsistencies by construction).
    val broken = Tables.candles(spark, dir)
      .withColumn("high_b", when(col("user_id") % 7 === 0, col("low")).otherwise(col("high")))
      .withColumn("low_b", when(col("user_id") % 7 === 0, col("high")).otherwise(col("low")))
    broken.select(
      col("user_id"), col("bucket"),
      round(greatest(col("high_b"), col("open"), col("close")), 6).as("high_fixed"),
      round(least(col("low_b"), col("open"), col("close")), 6).as("low_fixed"),
      (col("high_b") < greatest(col("open"), col("close")) ||
        col("low_b") > least(col("open"), col("close"))).as("was_repaired"))
  }

  val qcOhlcRepairSql: String = Tables.candlesSql +
    """, b AS (
      |  SELECT user_id, bucket, open, close,
      |    CASE WHEN user_id % 7 = 0 THEN low  ELSE high END AS high_b,
      |    CASE WHEN user_id % 7 = 0 THEN high ELSE low  END AS low_b
      |  FROM candles)
      |SELECT user_id, bucket,
      |  round(greatest(high_b, open, close), 6) + 0 AS high_fixed,
      |  round(least(low_b, open, close), 6) + 0 AS low_fixed,
      |  high_b < greatest(open, close) OR low_b > least(open, close) AS was_repaired
      |FROM b""".stripMargin

  // ---------------------------------------------------------------- W37
  /** W37 — gap interpolation fill (`data_quality.py:460-501`): densify
    * each user's hourly candle grid, linearly interpolate close across
    * gaps of 1–5 missing hours, volume 0, `is_gap_fill` flag. The grid is
    * `sequence()`+`explode` (Spark's Generator ≙ the reference's
    * reindex); interpolation is two ignoreNulls windows + a time lerp —
    * all builtin, one shuffle on user_id.
    *
    * At 100 TB the per-user `sequence()` is bounded by each key's own
    * time span (not global), so grid explosion stays proportional to the
    * key's data. */
  def w37GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.candles(spark, dir))

  /** The W37 operator over any (user_id, bucket, close, volume) frame —
    * separated so synthetic gap fixtures can drive it (FIXTURES.md §B). */
  def gapFill(candles: DataFrame): DataFrame = {
    // r15: the grid explode fans ~1.5k (user, span) rows out to the
    // full per-hour grid; the seed aggregate's exchange is bytes-tiny
    // so AQE coalesced its reader to ONE task — and because the agg
    // key (user_id) also satisfies the window partitioning, the
    // explode, the candle join, AND all four window passes fused into
    // that single serial task (measured 1t/1.2–1.4s ≈ the whole
    // query). Repartition on (user_id, b0) — deterministic, and NOT a
    // partitioning the window can reuse, so Catalyst cannot elide it
    // as redundant — with an EXPLICIT cluster-scaled count AQE must
    // respect: the fan-out spreads, and the windows get their own
    // parallel exchange.
    // (r16: width from the shared bytes-aware helper — the seed frame
    // is key-count-sized, so the estimate keeps the local width at the
    // core count and grows it with the key population at scale)
    val seeds = candles.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
    val grid = seeds
      .repartition(graft.util.Spread.width(seeds), col("user_id"), col("b0"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), expr("interval 1 hour"))).as("bucket"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
    val past = w.rowsBetween(Window.unboundedPreceding, 0)
    // the forward fill runs as a REVERSED running `last` (desc order,
    // unboundedPreceding→current), NOT `first` over
    // current→unboundedFollowing: Spark executes unbounded-FOLLOWING
    // frames by re-aggregating the tail for EVERY row — O(p²) per
    // partition, 18.7 s on sf0.1's ~8760-slot grids (found the moment
    // the bench action stopped letting Catalyst prune these columns) —
    // while the reversed running frame keeps O(p) state, at the cost of
    // one extra sort on the same exchange. Identical values: both
    // frames include the current row.
    val future = Window.partitionBy(col("user_id")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = grid.join(candles, Seq("user_id", "bucket"), "left")
      .withColumn("prev_close", last(col("close"), ignoreNulls = true).over(past))
      .withColumn("next_close", last(col("close"), ignoreNulls = true).over(future))
      .withColumn("prev_ts",
        last(when(col("close").isNotNull, col("bucket")), ignoreNulls = true).over(past))
      .withColumn("next_ts",
        last(when(col("close").isNotNull, col("bucket")), ignoreNulls = true).over(future))
      .withColumn("gap_hours",
        (unix_timestamp(col("next_ts")) - unix_timestamp(col("prev_ts"))) / 3600 - 1)
    joined.select(
      col("user_id"), col("bucket"),
      round(
        when(col("close").isNotNull, col("close"))
          .when(col("gap_hours").between(1, 5),
            col("prev_close") + (col("next_close") - col("prev_close")) *
              ((unix_timestamp(col("bucket")) - unix_timestamp(col("prev_ts"))) /
                (unix_timestamp(col("next_ts")) - unix_timestamp(col("prev_ts"))))),
        6).as("close_filled"),
      coalesce(col("volume"), lit(0L)).as("volume_filled"),
      (col("close").isNull && col("gap_hours").between(1, 5)).as("is_gap_fill"))
  }

  val w37Sql: String = Tables.candlesSql +
    """, span AS (
      |  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM candles GROUP BY user_id),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM span),
      |j AS (
      |  SELECT g.user_id, g.bucket, c.close, c.volume FROM grid g
      |  LEFT JOIN candles c ON c.user_id = g.user_id AND c.bucket = g.bucket),
      |x AS (
      |  SELECT user_id, bucket, close, volume,
      |    last_value(close IGNORE NULLS) OVER wp AS prev_close,
      |    first_value(close IGNORE NULLS) OVER wf AS next_close,
      |    last_value(CASE WHEN close IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS prev_ts,
      |    first_value(CASE WHEN close IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS next_ts
      |  FROM j
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         wp AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |y AS (
      |  SELECT user_id, bucket, close, volume, prev_close, next_close, prev_ts, next_ts,
      |    date_diff('second', prev_ts, next_ts) / 3600 - 1 AS gap_hours
      |  FROM x)
      |SELECT user_id, bucket,
      |  round(CASE WHEN close IS NOT NULL THEN close
      |             WHEN gap_hours BETWEEN 1 AND 5 THEN
      |               prev_close + (next_close - prev_close) *
      |                 (CAST(date_diff('second', prev_ts, bucket) AS DOUBLE) /
      |                  CAST(date_diff('second', prev_ts, next_ts) AS DOUBLE))
      |        END, 6) + 0 AS close_filled,
      |  CAST(coalesce(volume, 0) AS BIGINT) AS volume_filled,
      |  close IS NULL AND gap_hours BETWEEN 1 AND 5 AS is_gap_fill
      |FROM y""".stripMargin

  // ---------------------------------------------------------------- score
  /** Quality score + level (`data_validator.py:59-178`): per-user
    * deductions for gaps, outliers, insufficiency; score → level. */
  def qcScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.crossJoin(broadcast(
        ev.agg(avg(col("value")).as("mu"), stddev(col("value")).as("sigma"))))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        avg(when(abs(col("value") - col("mu")) / col("sigma") > 3, 1.0).otherwise(0.0))
          .as("outlier_pct"),
        (lit(1.0) - countDistinct(date_trunc("hour", col("ts"))) /
          (floor((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))) / 3600) + 1)
            .cast("double")).as("gap_pct"),
        (count(lit(1)) - countDistinct(col("ts"))).as("n_dup_ts"))
    // deduction weights and level cuts exactly as the reference
    // (`data_validator.py:49-98`, `enums.py:77-86`): dups −0.05, gaps>10%
    // −0.15, outliers −0.2/−0.1, insufficient −0.2, floored at 0
    val score = greatest(lit(0.0), lit(1.0) -
      when(col("n_dup_ts") > 0, 0.05).otherwise(0.0) -
      when(col("gap_pct") > 0.10, 0.15).otherwise(0.0) -
      when(col("outlier_pct") > 0.05, 0.2)
        .when(col("outlier_pct") > 0.0, 0.1).otherwise(0.0) -
      when(col("n") < 10, 0.2).otherwise(0.0))
    stats.select(
      col("user_id"), col("n"),
      round(col("outlier_pct"), 6).as("outlier_pct"),
      round(col("gap_pct"), 6).as("gap_pct"),
      round(score, 6).as("quality_score"),
      when(score >= 0.95, "excellent").when(score >= 0.80, "good")
        .when(score >= 0.60, "fair").otherwise("poor").as("quality_level"))
  }

  val qcScoreSql: String =
    """WITH g AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events),
      |s AS (
      |  SELECT user_id, count(*) AS n,
      |    avg(CASE WHEN abs(value - mu) / sigma > 3 THEN 1.0 ELSE 0.0 END) AS outlier_pct,
      |    1.0 - count(DISTINCT date_trunc('hour', ts)) /
      |      CAST(floor(date_diff('second', min(ts), max(ts)) / 3600) + 1 AS DOUBLE) AS gap_pct,
      |    count(*) - count(DISTINCT ts) AS n_dup_ts
      |  FROM events, g GROUP BY user_id),
      |sc AS (
      |  SELECT user_id, n, outlier_pct, gap_pct,
      |    greatest(0.0,
      |    1.0 - (CASE WHEN n_dup_ts > 0 THEN 0.05 ELSE 0.0 END)
      |        - (CASE WHEN gap_pct > 0.10 THEN 0.15 ELSE 0.0 END)
      |        - (CASE WHEN outlier_pct > 0.05 THEN 0.2
      |                WHEN outlier_pct > 0.0 THEN 0.1 ELSE 0.0 END)
      |        - (CASE WHEN n < 10 THEN 0.2 ELSE 0.0 END)) AS score
      |  FROM s)
      |SELECT user_id, n,
      |  round(outlier_pct, 6) + 0 AS outlier_pct, round(gap_pct, 6) + 0 AS gap_pct,
      |  round(score, 6) + 0 AS quality_score,
      |  CASE WHEN score >= 0.95 THEN 'excellent' WHEN score >= 0.80 THEN 'good'
      |       WHEN score >= 0.60 THEN 'fair' ELSE 'poor' END AS quality_level
      |FROM sc""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc_ohlc_repair" -> (qcOhlcRepair _),
    "w37_gap_fill"   -> (w37GapFill _),
    "qc_score"       -> (qcScore _))

  def oracles: Map[String, String] = Map(
    "qc_ohlc_repair" -> qcOhlcRepairSql,
    "w37_gap_fill"   -> w37Sql,
    "qc_score"       -> qcScoreSql)
}
