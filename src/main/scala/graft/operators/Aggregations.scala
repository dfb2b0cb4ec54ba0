package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators — SURVEY §2.6. All are partial+final hash
  * aggregates (map-side combine free from Catalyst); the "fit then apply"
  * normalization/outlier shapes broadcast a tiny stats result back over
  * the fact table instead of windowing over the whole dataset — at 100 TB
  * the stats row is bytes, so apply is a broadcast-join map stage.
  */
object Aggregations {

  /** A1 — global stats over a range (`repository.py:247-262`). */
  def a1Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-03").cast("timestamp"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"),
        round(avg(col("value")), 6).as("avg_value"),
        round(stddev(col("value")), 6).as("std_value"),
        sum(when(col("value") > 150, 1).otherwise(0)).as("n_high"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"))

  val a1Sql: String =
    """SELECT count(*) AS n,
      |  round(min(value), 6) + 0 AS min_value, round(max(value), 6) + 0 AS max_value,
      |  round(avg(value), 6) + 0 AS avg_value, round(stddev_samp(value), 6) + 0 AS std_value,
      |  CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM events WHERE ts >= TIMESTAMP '2024-01-03'""".stripMargin

  /** A2/A3 — group-by distribution counts (`repository.py:271-283`). */
  def a2GroupCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("value")), 6).as("avg_value"))

  val a2Sql: String =
    """SELECT event_type, count(*) AS n, round(avg(value), 6) + 0 AS avg_value
      |FROM events GROUP BY event_type""".stripMargin

  /** A3 — two-key distribution over the documents corpus. */
  def a3DocsByLang(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           round(avg(col("n_chars")), 6).as("avg_chars"))

  val a3Sql: String =
    """SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       round(avg(n_chars), 6) + 0 AS avg_chars
      |FROM documents GROUP BY lang, source""".stripMargin

  /** A5 — daily stats rollup with FILTERed counts
    * (`forex.daily_stats` view, `02-create-tables.sh`): first/last by
    * explicit in-day timestamp order via min_by/max_by (SURVEY §7.5 —
    * bare first() is nondeterministic in Spark aggs). */
  def a5DailyStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(min_by(col("value"), col("ts")), 6).as("first_value"),
        round(max_by(col("value"), col("ts")), 6).as("last_value"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"),
        sum(when(col("value") > 190, 1).otherwise(0)).as("n_outlier"))

  val a5Sql: String =
    """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
      |  round(arg_min(value, ts), 6) + 0 AS first_value,
      |  round(arg_max(value, ts), 6) + 0 AS last_value,
      |  round(min(value), 6) + 0 AS min_value, round(max(value), 6) + 0 AS max_value,
      |  CAST(count(*) FILTER (WHERE value > 190) AS BIGINT) AS n_outlier
      |FROM events GROUP BY 1, 2""".stripMargin

  /** A6 — validation-stats shape (`data_fetcher.py:187-236`): per-group
    * quality ratios. */
  def a6ValidationStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(when(col("value") > 100, 1.0).otherwise(0.0)), 6).as("pct_high"),
        round(avg(when(col("value") <= 0, 1.0).otherwise(0.0)), 6).as("pct_nonpositive"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"),
        round(avg(col("value")), 6).as("mean_value"))

  val a6Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END), 6) + 0 AS pct_high,
      |  round(avg(CASE WHEN value <= 0 THEN 1.0 ELSE 0.0 END), 6) + 0 AS pct_nonpositive,
      |  round(min(value), 6) + 0 AS min_value, round(max(value), 6) + 0 AS max_value,
      |  round(avg(value), 6) + 0 AS mean_value
      |FROM events GROUP BY event_type""".stripMargin

  /** A7 — normalization fit+apply (`normalizer.py:138-174`): fit minmax +
    * zscore params in one global agg, broadcast the 1-row result with a
    * crossJoin, apply as a map stage. The oracle uses OVER () windows,
    * which is the same math; the Spark plan is the scalable one (no
    * whole-table window state). */
  def a7Normalize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val fit = ev.agg(
      min(col("value")).as("v_min"), max(col("value")).as("v_max"),
      avg(col("value")).as("v_mean"), stddev(col("value")).as("v_std"))
    ev.crossJoin(broadcast(fit))
      .select(
        col("event_id"),
        round((col("value") - col("v_min")) / (col("v_max") - col("v_min")), 6).as("minmax"),
        round((col("value") - col("v_mean")) / col("v_std"), 6).as("zscore"))
  }

  val a7Sql: String =
    """SELECT event_id,
      |  round((value - min(value) OVER ()) / (max(value) OVER () - min(value) OVER ()), 6) + 0 AS minmax,
      |  round((value - avg(value) OVER ()) / stddev_samp(value) OVER (), 6) + 0 AS zscore
      |FROM events""".stripMargin

  /** A7b — robust scaler fit (`normalizer.py:165-171`): median/q25/q75 via
    * exact interpolated percentile (Spark `percentile` ≙ DuckDB
    * `quantile_cont`); at 100 TB swap for `percentile_approx` (t-digest). */
  def a7Robust(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("q25"),
        round(expr("percentile(value, 0.5)"), 6).as("median"),
        round(expr("percentile(value, 0.75)"), 6).as("q75"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6).as("iqr"))

  val a7RobustSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.25), 6) + 0 AS q25,
      |  round(quantile_cont(value, 0.50), 6) + 0 AS median,
      |  round(quantile_cont(value, 0.75), 6) + 0 AS q75,
      |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) + 0 AS iqr
      |FROM events GROUP BY event_type""".stripMargin

  /** A8 — completeness / gap percentage (`data_validator.py:251-290`):
    * expected hourly periods vs observed, per user. */
  def a8Completeness(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        (floor((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))) / 3600) + 1)
          .as("expected_hours"),
        countDistinct(date_trunc("hour", col("ts"))).as("observed_hours"))
      .withColumn("completeness_pct",
        round(col("observed_hours") * lit(100.0) / col("expected_hours"), 6))

  val a8Sql: String =
    """SELECT user_id,
      |  CAST(floor(date_diff('second', min(ts), max(ts)) / 3600) + 1 AS BIGINT) AS expected_hours,
      |  count(DISTINCT date_trunc('hour', ts)) AS observed_hours,
      |  round(count(DISTINCT date_trunc('hour', ts)) * 100.0 /
      |        (floor(date_diff('second', min(ts), max(ts)) / 3600) + 1), 6) + 0 AS completeness_pct
      |FROM events GROUP BY user_id""".stripMargin

  /** A9 — outlier detection, z-score ∪ IQR (`data_validator.py:292-331`):
    * fit per-group stats, broadcast-join back, flag. Sample stddev (pandas
    * ddof=1) to match the reference. */
  def a9Outliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val fit = ev.groupBy(col("event_type").as("fit_et"))
      .agg(
        avg(col("value")).as("mu"), stddev(col("value")).as("sigma"),
        expr("percentile(value, 0.25)").as("q25"),
        expr("percentile(value, 0.75)").as("q75"))
      .withColumn("iqr", col("q75") - col("q25"))
    ev.join(broadcast(fit), ev("event_type") === fit("fit_et"))
      .withColumn("is_z_outlier", abs(col("value") - col("mu")) / col("sigma") > 3.0)
      .withColumn("is_iqr_outlier",
        col("value") < col("q25") - lit(1.5) * col("iqr") ||
        col("value") > col("q75") + lit(1.5) * col("iqr"))
      .filter(col("is_z_outlier") || col("is_iqr_outlier"))
      .select(col("event_id"), col("event_type"), col("value"),
              col("is_z_outlier"), col("is_iqr_outlier"))
  }

  val a9Sql: String =
    """WITH fit AS (
      |  SELECT event_type AS fit_et, avg(value) AS mu, stddev_samp(value) AS sigma,
      |         quantile_cont(value, 0.25) AS q25, quantile_cont(value, 0.75) AS q75
      |  FROM events GROUP BY event_type)
      |SELECT event_id, event_type, value,
      |       abs(value - mu) / sigma > 3.0 AS is_z_outlier,
      |       (value < q25 - 1.5 * (q75 - q25) OR value > q75 + 1.5 * (q75 - q25)) AS is_iqr_outlier
      |FROM events JOIN fit ON event_type = fit_et
      |WHERE abs(value - mu) / sigma > 3.0
      |   OR value < q25 - 1.5 * (q75 - q25) OR value > q75 + 1.5 * (q75 - q25)""".stripMargin

  /** A10 — session/market summary (`market_filters.py:354-406`): bucket
    * each event into a trading session by UTC hour (chained `when`s ≙
    * np.select), then per-session stats. */
  def a10SessionSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("h", hour(col("ts")))
      .withColumn("session",
        when(col("h") >= 22 || col("h") < 7, "sydney")
          .when(col("h") < 9, "tokyo")
          .when(col("h") < 16, "london")
          .otherwise("new_york"))
      .groupBy(col("session"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("value")), 6).as("avg_value"),
           round(min(col("value")), 6).as("min_value"),
           round(max(col("value")), 6).as("max_value"),
           countDistinct(col("user_id")).as("n_users"))

  val a10Sql: String =
    """SELECT CASE
      |         WHEN extract(hour FROM ts) >= 22 OR extract(hour FROM ts) < 7 THEN 'sydney'
      |         WHEN extract(hour FROM ts) < 9  THEN 'tokyo'
      |         WHEN extract(hour FROM ts) < 16 THEN 'london'
      |         ELSE 'new_york' END AS session,
      |       count(*) AS n, round(avg(value), 6) + 0 AS avg_value,
      |       round(min(value), 6) + 0 AS min_value, round(max(value), 6) + 0 AS max_value,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  /** A5b — hierarchical rollup (absent in the reference, free in Spark —
    * SURVEY §2.6 note): per (event_type, day), per event_type, and grand
    * total in ONE pass; at 100 TB this replaces three separate scans. */
  def a5Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))

  val a5RollupSql: String =
    """SELECT event_type, date_trunc('day', ts) AS day,
      |       count(*) AS n, round(avg(value), 6) + 0 AS avg_value
      |FROM events GROUP BY ROLLUP (event_type, date_trunc('day', ts))""".stripMargin

  /** A12 — microstructure metrics (`premium_data_provider.py:202-285`):
    * per-stream avg/std spread, tick frequency, price impact (mean
    * absolute mid move per tick), liquidity score. The lag window and the
    * group-by share the same `user_id` hash partitioning, so Catalyst
    * reuses one exchange — at 100 TB this is one shuffle, not two. Tie
    * order on equal timestamps is pinned by `event_id` so both engines
    * difference the same neighbor. */
  def a12Microstructure(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("spread", abs(col("value")) * lit(0.0001))
      .withColumn("dmid", abs(col("value") - lag(col("value"), 1).over(w)))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        round(avg(col("spread")), 6).as("avg_spread"),
        round(stddev(col("spread")), 6).as("std_spread"),
        round(count(lit(1)) * lit(3600.0) /
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))), 6)
          .as("ticks_per_hour"),
        round(avg(col("dmid")), 6).as("avg_impact"),
        round((count(lit(1)) * lit(3600.0) /
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))) /
          (lit(1.0) + lit(10000.0) * avg(col("spread"))), 6).as("liquidity_score"))
  }

  val a12Sql: String =
    """WITH t AS (
      |  SELECT user_id, ts, value, abs(value) * 0.0001 AS spread,
      |    abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dmid
      |  FROM events)
      |SELECT user_id, count(*) AS n_ticks,
      |  round(avg(spread), 6) + 0 AS avg_spread,
      |  round(stddev_samp(spread), 6) + 0 AS std_spread,
      |  round(count(*) * 3600.0 / date_diff('second', min(ts), max(ts)), 6) + 0 AS ticks_per_hour,
      |  round(avg(dmid), 6) + 0 AS avg_impact,
      |  round((count(*) * 3600.0 / date_diff('second', min(ts), max(ts))) /
      |        (1.0 + 10000.0 * avg(spread)), 6) + 0 AS liquidity_score
      |FROM t GROUP BY user_id""".stripMargin

  /** A13 — pattern summary (`pattern_detection.py:506-547`): stack the
    * W32 detection booleans to long form, then counts / avg strength /
    * most-recent sighting per pattern type. */
  def a13PatternSummary(spark: SparkSession, dir: String): DataFrame = {
    val p = WindowsAdvanced.w32CandlePatterns(spark, dir)
    val names = Seq("doji", "hammer", "shooting_star",
      "bullish_engulfing", "bearish_engulfing", "morning_star", "evening_star")
    p.select(
        col("bucket"), col("pattern_strength"),
        expr(s"stack(${names.size}, " +
          names.map(n => s"'$n', is_$n").mkString(", ") + ") AS (pattern, detected)"))
      .filter(col("detected"))
      .groupBy(col("pattern"))
      .agg(
        count(lit(1)).as("n_detected"),
        round(avg(col("pattern_strength")), 6).as("avg_strength"),
        max(col("bucket")).as("last_seen"))
  }

  val a13Sql: String = WindowsAdvanced.w32Cte +
    """,
      |s AS (
      |  SELECT 'doji' AS pattern, is_doji AS detected, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'hammer', is_hammer, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'shooting_star', is_shooting_star, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'bullish_engulfing', is_bullish_engulfing, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'bearish_engulfing', is_bearish_engulfing, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'morning_star', is_morning_star, bucket, pattern_strength FROM patterns
      |  UNION ALL SELECT 'evening_star', is_evening_star, bucket, pattern_strength FROM patterns)
      |SELECT pattern, count(*) AS n_detected,
      |       round(avg(pattern_strength), 6) + 0 AS avg_strength,
      |       max(bucket) AS last_seen
      |FROM s WHERE detected GROUP BY pattern""".stripMargin

  /** Incremental rollup maintenance — the 100 TB pattern for keeping a
    * daily stats table fresh WITHOUT rescanning history: store mergeable
    * partials (count, sum, sum-of-squares, min, max), then fold each new
    * batch in by re-aggregating state ∪ delta on the group key. Here the
    * table splits at a cutoff into "stored state" and "today's delta",
    * the two partial sets union-merge (a shuffle over days × types — the
    * STATE size, not the event count), and the report derives avg/std
    * from merged moments. The oracle aggregates the raw table directly,
    * so the hash match IS the proof that merge ≡ full recompute (the
    * invariant that makes sum/count/min/max/M2 "algebraic" aggregates
    * safe to maintain incrementally; avg/std stay derived, never stored).
    */
  def rollupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-25").cast("timestamp")
    val ev = Tables.events(spark, dir)
    def partials(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("s"),
        sum(col("value") * col("value")).as("s2"),
        min(col("value")).as("mn"),
        max(col("value")).as("mx"))
    val state = partials(ev.filter(col("ts") < cutoff))  // yesterday's rollup
    val delta = partials(ev.filter(col("ts") >= cutoff)) // today's increment
    state.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("s2")).as("s2"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .select(col("day"), col("event_type"), col("n"),
        round(col("s") / col("n"), 6).as("avg_value"),
        round(col("mn"), 6).as("min_value"),
        round(col("mx"), 6).as("max_value"),
        when(col("n") > 1,
          round(sqrt((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1)), 6))
          .as("std_value"))
  }

  val rollupIncrementalSql: String =
    """WITH p AS (
      |  SELECT date_trunc('day', ts) AS day, event_type,
      |         count(*) AS n, sum(value) AS s, sum(value * value) AS s2,
      |         min(value) AS mn, max(value) AS mx
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |  round(s / n, 6) + 0 AS avg_value,
      |  round(mn, 6) + 0 AS min_value,
      |  round(mx, 6) + 0 AS max_value,
      |  CASE WHEN n > 1 THEN round(sqrt((s2 - s * s / n) / (n - 1)), 6) + 0 END AS std_value
      |FROM p""".stripMargin

  /** The OHLC candle BUILD as its own first-class query (r16, verdict
    * item 2): ~100 registered queries consume the memoized
    * [[graft.Tables.candles]] frame, so since the r15 memo their warm
    * times measure marginal window/join work while the build cost sat
    * only inside `warmup_sec`/`queries_cold`. This row pins the build's
    * steady-state cost as an attributable bench number — the public
    * entry IS the uncached derivation (no memo read on either pass),
    * and the oracle replays the exact shared [[graft.Tables.candlesSql]]
    * aggregate every indicator oracle already opens with. */
  def candlesBuild(spark: SparkSession, dir: String): DataFrame =
    Tables.candlesUncached(spark, dir)

  val candlesBuildSql: String = Tables.candlesSql +
    "\nSELECT user_id, bucket, open, high, low, close, volume FROM candles"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "candles_build"       -> (candlesBuild _),
    "rollup_incremental"  -> (rollupIncremental _),
    "a1_stats"            -> (a1Stats _),
    "a2_group_counts"     -> (a2GroupCounts _),
    "a3_docs_by_lang"     -> (a3DocsByLang _),
    "a5_daily_stats"      -> (a5DailyStats _),
    "a6_validation_stats" -> (a6ValidationStats _),
    "a7_normalize"        -> (a7Normalize _),
    "a7_robust_scaler"    -> (a7Robust _),
    "a8_completeness"     -> (a8Completeness _),
    "a9_outliers"         -> (a9Outliers _),
    "a10_session_summary" -> (a10SessionSummary _),
    "a12_microstructure"  -> (a12Microstructure _),
    "a13_pattern_summary" -> (a13PatternSummary _),
    "a5_rollup"           -> (a5Rollup _))

  def oracles: Map[String, String] = Map(
    "candles_build"       -> candlesBuildSql,
    "rollup_incremental"  -> rollupIncrementalSql,
    "a1_stats"            -> a1Sql,
    "a2_group_counts"     -> a2Sql,
    "a3_docs_by_lang"     -> a3Sql,
    "a5_daily_stats"      -> a5Sql,
    "a6_validation_stats" -> a6Sql,
    "a7_normalize"        -> a7Sql,
    "a7_robust_scaler"    -> a7RobustSql,
    "a8_completeness"     -> a8Sql,
    "a9_outliers"         -> a9Sql,
    "a10_session_summary" -> a10Sql,
    "a12_microstructure"  -> a12Sql,
    "a13_pattern_summary" -> a13Sql,
    "a5_rollup"           -> a5RollupSql)
}
