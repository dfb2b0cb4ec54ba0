package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-shaping operators — SURVEY §2.1 (S3–S8) and the JSON/scalar
  * function surface (§2.11). External HTTP fetches are out of scope; what
  * the reference does to the fetched payloads (clean, parse, synthesize,
  * derive) is reproduced over the testdata tables.
  */
object Sources {

  /** S3 — ingest cleanup (`data_fetcher.py:402-445`): drop null keys,
    * clamp negative volume to 0, dedup on the natural key keeping the
    * first by time, normalize a string column. One filter+project and a
    * keyed dedup — no extra shuffle beyond the dedup's. */
  def s3IngestCleanup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .na.drop(Seq("ts", "user_id"))
      .withColumn("value", greatest(col("value"), lit(0.0)))
      .withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        round(col("value"), 6).as("value"))

  val s3Sql: String =
    """SELECT event_id, ts, user_id, lower(trim(event_type)) AS event_type,
      |       round(greatest(value, 0.0), 6) + 0 AS value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      |      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL) t
      |WHERE rn = 1""".stripMargin

  /** S4/S5 — JSON payload parsing (`alpha_vantage_client.py:70-146`):
    * the events `props` column is a JSON object; parse with an explicit
    * schema (never inferSchema at scale) and surface typed fields. */
  def s4JsonParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .withColumn("parsed", from_json(col("props"), schema))
      .select(col("event_id"), col("parsed.k").as("prop_k"),
        (col("parsed.k") % 10).as("prop_k_mod"),
        to_json(struct(col("event_id"), col("event_type"))).as("reserialized"))
  }

  val s4Sql: String =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
      |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS prop_k_mod,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS reserialized
      |FROM events""".stripMargin

  /** S6 — VWAP aggregates (`polygon_client.py:75-125`): volume-weighted
    * average price per bucket; volume proxy = |value|, price = value. */
  def s6Vwap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        round(sum(col("value") * abs(col("value"))) / sum(abs(col("value"))), 6).as("vwap"),
        count(lit(1)).as("transactions"))

  val s6Sql: String =
    """SELECT date_trunc('day', ts) AS day, event_type,
      |  round(sum(value * abs(value)) / sum(abs(value)), 6) + 0 AS vwap,
      |  count(*) AS transactions
      |FROM events GROUP BY 1, 2""".stripMargin

  /** S7 — tick synthesis from aggregates (`polygon_client.py:146-234`):
    * 10 interpolated ticks per candle via explode(sequence) — Spark's
    * Generator replaces the reference's Python loop; linear open→close
    * walk with a deterministic wiggle. */
  def s7TickSynthesis(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.candles(spark, dir).filter(col("user_id") < 10)
    c.select(col("user_id"), col("bucket"), col("open"), col("close"), col("high"), col("low"),
        explode(sequence(lit(0), lit(9))).as("i"))
      .withColumn("frac", col("i") / 9.0)
      .withColumn("mid", round(col("open") + (col("close") - col("open")) * col("frac"), 6))
      .withColumn("tick_ts", col("bucket") + expr("make_interval(0, 0, 0, 0, 0, i * 6, 0)"))
      .select(col("user_id"), col("tick_ts"), col("i"), col("mid"))
  }

  val s7Sql: String = Tables.candlesSql +
    """
      |SELECT user_id,
      |       bucket + to_minutes(CAST(i * 6 AS BIGINT)) AS tick_ts,
      |       CAST(i AS INT) AS i,
      |       round(open + (close - open) * (i / 9.0), 6) + 0 AS mid
      |FROM candles, unnest(generate_series(0, 9)) AS t(i)
      |WHERE user_id < 10""".stripMargin

  /** S8 — order-book snapshot synthesis (`polygon_client.py:236-296`):
    * N depth levels around the price with exponentially decaying size,
    * assembled into a typed array column (serialized for the compare). */
  def s8OrderBook(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.candles(spark, dir).filter(col("user_id") < 5)
    c.select(col("user_id"), col("bucket"), col("close"),
        explode(sequence(lit(0), lit(4))).as("level"))
      .withColumn("bid_price", round(col("close") * (lit(1.0) - (col("level") + 1) * 0.0001), 6))
      .withColumn("ask_price", round(col("close") * (lit(1.0) + (col("level") + 1) * 0.0001), 6))
      .withColumn("size", round(lit(100.0) * pow(lit(0.8), col("level")), 6))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        concat_ws("|", transform(
          sort_array(collect_list(struct(col("level"), col("bid_price"), col("size")))),
          r => concat_ws(":", r.getField("level"), r.getField("bid_price"), r.getField("size"))))
          .as("bids"),
        concat_ws("|", transform(
          sort_array(collect_list(struct(col("level"), col("ask_price"), col("size")))),
          r => concat_ws(":", r.getField("level"), r.getField("ask_price"), r.getField("size"))))
          .as("asks"))
  }

  // sort_array pins level order regardless of partial-agg merge order;
  // DuckDB mirrors with ORDER BY inside list().
  val s8Sql: String = Tables.candlesSql +
    """, lv AS (
      |  SELECT user_id, bucket, level,
      |    round(close * (1.0 - (level + 1) * 0.0001), 6) + 0 AS bid_price,
      |    round(close * (1.0 + (level + 1) * 0.0001), 6) + 0 AS ask_price,
      |    round(100.0 * pow(0.8, level), 6) + 0 AS size
      |  FROM candles, unnest(generate_series(0, 4)) AS t(level)
      |  WHERE user_id < 5)
      |SELECT user_id, bucket,
      |  array_to_string(list(level || ':' || bid_price || ':' || size ORDER BY level), '|') AS bids,
      |  array_to_string(list(level || ':' || ask_price || ':' || size ORDER BY level), '|') AS asks
      |FROM lv GROUP BY user_id, bucket""".stripMargin

  /** S5 — realtime quote + economic-indicator series
    * (`alpha_vantage_client.py:148-201`): one latest-quote row per
    * series with change/percent vs the previous observation, from a
    * daily indicator rollup. `max_by(struct(...))` keeps the pick
    * single-pass; the change fields come from a lag on the daily series. */
  def s5EconIndicator(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(avg(col("value")).as("indicator"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("prev", lag(col("indicator"), 1).over(w))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day").desc)))
      .filter(col("rn") === 1 && col("prev").isNotNull)
      .select(col("event_type"), col("day").as("latest_day"),
        round(col("indicator"), 6).as("indicator"),
        round(col("indicator") - col("prev"), 6).as("change"),
        round((col("indicator") - col("prev")) / col("prev") * 100, 6).as("change_pct"))
  }

  val s5Sql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS indicator
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, day, indicator,
      |         lag(indicator) OVER (PARTITION BY event_type ORDER BY day) AS prev,
      |         row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
      |  FROM daily)
      |SELECT event_type, day AS latest_day, round(indicator, 6) + 0 AS indicator,
      |       round(indicator - prev, 6) + 0 AS change,
      |       round((indicator - prev) / prev * 100, 6) + 0 AS change_pct
      |FROM lagged WHERE rn = 1 AND prev IS NOT NULL""".stripMargin

  /** §2.11 — cyclical time encodings + categorical time-of-day + string
    * ops (`market_filters.py:104-230`; `persistence.py:468-483`). */
  def fnScalarSurface(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("h", hour(col("ts")))
      .select(
        col("event_id"),
        round(sin(col("h") * (2 * math.Pi / 24)), 6).as("hour_sin"),
        round(cos(col("h") * (2 * math.Pi / 24)), 6).as("hour_cos"),
        (dayofweek(col("ts")) === 6).as("is_friday"),
        (dayofweek(col("ts")).isin(1, 7)).as("is_weekend"),
        quarter(col("ts")).as("q"),
        when(col("h") < 6, "night").when(col("h") < 12, "morning")
          .when(col("h") < 18, "afternoon").otherwise("evening").as("time_of_day"),
        upper(concat(lit("C:"), col("event_type"))).as("symbol_formatted"))

  val fnScalarSql: String =
    """SELECT event_id,
      |  round(sin(extract(hour FROM ts) * (2 * pi() / 24)), 6) + 0 AS hour_sin,
      |  round(cos(extract(hour FROM ts) * (2 * pi() / 24)), 6) + 0 AS hour_cos,
      |  dayofweek(ts) = 5 AS is_friday,
      |  dayofweek(ts) IN (0, 6) AS is_weekend,
      |  CAST(quarter(ts) AS INT) AS q,
      |  CASE WHEN extract(hour FROM ts) < 6 THEN 'night'
      |       WHEN extract(hour FROM ts) < 12 THEN 'morning'
      |       WHEN extract(hour FROM ts) < 18 THEN 'afternoon'
      |       ELSE 'evening' END AS time_of_day,
      |  upper('C:' || event_type) AS symbol_formatted
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s3_ingest_cleanup" -> (s3IngestCleanup _),
    "s4_json_parse"     -> (s4JsonParse _),
    "s6_vwap"           -> (s6Vwap _),
    "s7_tick_synthesis" -> (s7TickSynthesis _),
    "s8_order_book"     -> (s8OrderBook _),
    "s5_econ_indicator" -> (s5EconIndicator _),
    "fn_scalar_surface" -> (fnScalarSurface _))

  def oracles: Map[String, String] = Map(
    "s3_ingest_cleanup" -> s3Sql,
    "s4_json_parse"     -> s4Sql,
    "s6_vwap"           -> s6Sql,
    "s7_tick_synthesis" -> s7Sql,
    "s8_order_book"     -> s8Sql,
    "s5_econ_indicator" -> s5Sql,
    "fn_scalar_surface" -> fnScalarSql)
}
