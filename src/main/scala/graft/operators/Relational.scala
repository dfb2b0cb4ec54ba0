package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators: scans, filters, aggregations — SURVEY §2.1,
  * §2.3, §2.6. Each query has a DuckDB oracle keyed by the same name; all
  * computed doubles are rounded identically on both sides so the driver's
  * value-hash compare is stable across engines.
  */
object Relational {

  /** A1-style global pricing summary (the flagship aggregation).
    * Partial+final hash aggregate — one shuffle on the two group keys;
    * at 100 TB map-side combine reduces shuffle volume to
    * |groups| × |mappers| rows.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) + 0        AS sum_qty,
      |  round(sum(l_extendedprice), 4) + 0   AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) + 0 AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) + 0 AS sum_charge,
      |  round(avg(l_quantity), 6) + 0        AS avg_qty,
      |  round(avg(l_extendedprice), 6) + 0   AS avg_price,
      |  round(avg(l_discount), 6) + 0        AS avg_disc,
      |  count(*)                         AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** A4 — the reference's `time_bucket` OHLC resample
    * (`app/database/repository.py:424-504`) over the events stream. */
  def a4Resample(spark: SparkSession, dir: String): DataFrame =
    Tables.candles(spark, dir)
      .select(
        col("user_id"), col("bucket"),
        round(col("open"), 6).as("open"),
        round(col("high"), 6).as("high"),
        round(col("low"), 6).as("low"),
        round(col("close"), 6).as("close"),
        col("volume"))

  val a4ResampleSql: String =
    Tables.candlesSql +
      """
        |SELECT user_id, bucket,
        |  round(open, 6) + 0 AS open, round(high, 6) + 0 AS high,
        |  round(low, 6) + 0  AS low,  round(close, 6) + 0 AS close, volume
        |FROM candles""".stripMargin

  /** A4 full endpoint shape (`repository.py:445-466`): per-key daily
    * buckets with ordered first/last, `bool_or` flags, newest-first
    * pagination — bucket agg + TakeOrdered + native offset in one plan. */
  def a4ResamplePaged(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") === 3)
      .groupBy(date_trunc("day", col("ts")).as("bucket"))
      .agg(
        round(min_by(col("value"), col("ts")), 6).as("open"),
        round(max(col("value")), 6).as("high"),
        round(min(col("value")), 6).as("low"),
        round(max_by(col("value"), col("ts")), 6).as("close"),
        count(lit(1)).as("volume"),
        round(avg(col("value")), 6).as("avg_value"),
        bool_or(col("value") > 190).as("is_outlier"))
      .orderBy(col("bucket").desc)
      .offset(2).limit(10)

  val a4PagedSql: String =
    """SELECT date_trunc('day', ts) AS bucket,
      |  round(arg_min(value, ts), 6) + 0 AS open, round(max(value), 6) + 0 AS high,
      |  round(min(value), 6) + 0 AS low,  round(arg_max(value, ts), 6) + 0 AS close,
      |  count(*) AS volume, round(avg(value), 6) + 0 AS avg_value,
      |  bool_or(value > 190) AS is_outlier
      |FROM events WHERE user_id = 3
      |GROUP BY 1 ORDER BY bucket DESC LIMIT 10 OFFSET 2""".stripMargin

  /** A4 at an arbitrary interval — the reference's granularity parameter
    * spans 1m/5m/15m/1h/4h/1d (`repository.py:424-443`); non-calendar
    * intervals can't `date_trunc`, so the bucket is epoch arithmetic
    * (`floor(epoch/Δ)·Δ` ≙ TimescaleDB `time_bucket(Δ, ts)`), here Δ =
    * 4 h. Same one-aggregate shape as the hourly resample — granularity
    * changes a constant, never the plan. */
  def a4Resample4h(spark: SparkSession, dir: String): DataFrame = {
    val interval = 4 * 3600
    Tables.events(spark, dir)
      .groupBy(col("user_id"),
        timestamp_seconds(floor(unix_timestamp(col("ts")) / interval) * interval).as("bucket"))
      .agg(
        round(min_by(col("value"), col("ts")), 6).as("open"),
        round(max(col("value")), 6).as("high"),
        round(min(col("value")), 6).as("low"),
        round(max_by(col("value"), col("ts")), 6).as("close"),
        count(lit(1)).as("volume"))
  }

  // bucket via date_trunc arithmetic (plain TIMESTAMP), not
  // to_timestamp()::TIMESTAMP — the TIMESTAMPTZ round-trip lands in a
  // different type family in the driver's schema compare (r02 schema FAIL);
  // 4 h divides a day, so hour-trunc minus hour%4 ≡ epoch-floor(14400)
  val a4Resample4hSql: String =
    """SELECT user_id,
      |  date_trunc('hour', ts) - (CAST(extract(hour FROM ts) AS INT) % 4) * INTERVAL 1 HOUR AS bucket,
      |  round(arg_min(value, ts), 6) + 0 AS open, round(max(value), 6) + 0 AS high,
      |  round(min(value), 6) + 0 AS low,  round(arg_max(value, ts), 6) + 0 AS close,
      |  count(*) AS volume
      |FROM events GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"      -> (q1Agg _),
    "a4_resample" -> (a4Resample _),
    "a4_resample_4h" -> (a4Resample4h _),
    "a4_resample_paged" -> (a4ResamplePaged _))

  def oracles: Map[String, String] = Map(
    "q1_agg"      -> q1AggSql,
    "a4_resample" -> a4ResampleSql,
    "a4_resample_4h" -> a4Resample4hSql,
    "a4_resample_paged" -> a4PagedSql)
}
