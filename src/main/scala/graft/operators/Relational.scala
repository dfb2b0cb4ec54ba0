package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------- star join
  /** TPC-H-Q3-shaped STAR JOIN: segment-filtered customers ⋈ orders ⋈
    * lineitem, revenue per open order, top 10. The canonical optimizer
    * exercise on this schema: the selective dimension (one-fifth of
    * customers) broadcasts into the orders join, that result broadcasts
    * into the fact join or shuffles on orderkey (Catalyst + AQE pick by
    * measured size), and only the fact scan is large. Filters sit on
    * all three scan predicates — `.explain` shows them pushed. */
  def q3StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3StarJoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) + 0 AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H-Q5-shaped LOCAL-SUPPLIER revenue: the canonical multi-way
    * join-reorder exercise — region→nation restricts two dimension
    * chains (customer's and supplier's nation) that must AGREE
    * (`c_nationkey = s_nationkey`, the "local supplier" predicate that
    * can't be pushed to either scan alone), over a date-filtered orders
    * window against the lineitem fact. Shape at 100 TB: every
    * dimension (region, nation, supplier, the filtered customer set)
    * broadcasts; orders and lineitem — the only fact-sized inputs —
    * shuffle once on orderkey or let AQE convert to broadcast when the
    * filtered orders side measures small. Catalyst reorders the join
    * graph freely because everything is declared as equi-joins plus a
    * residual filter. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      // n_name tiebreak: two nations with equal rounded revenue must
      // order identically on both engines (q3 does the same via orderkey)
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) + 0 AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN supplier ON s_nationkey = n_nationkey
      |JOIN lineitem ON l_suppkey = s_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** WIDE→LONG reshape via the native `Dataset.unpivot` (Spark 4's
    * melt): the OHLC candle row becomes four (field, value) rows — the
    * long form every plotting/feature-store layer wants. Pure map-side
    * projection (one output row per input cell, no shuffle, no UDF);
    * the reverse trip is the pivot already covered by
    * `pivot_daily_mix`. Values are rounded BEFORE the melt so both
    * engines reshape identical doubles. NULL semantics are pinned to
    * DuckDB's UNPIVOT default (EXCLUDE NULLS): `Dataset.unpivot`
    * RETAINS null cells, so they are filtered explicitly — latent on
    * the arg_min/max candle fixture (never null) but load-bearing the
    * first time a source delivers a null OHLC cell. */
  def reshapeUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.candles(spark, dir)
      .select(col("user_id"), col("bucket"),
        round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
        round(col("low"), 6).as("low"), round(col("close"), 6).as("close"))
      .unpivot(
        Array(col("user_id"), col("bucket")),
        Array(col("open"), col("high"), col("low"), col("close")),
        "field", "value")
      .filter(col("value").isNotNull)

  val reshapeUnpivotSql: String =
    Tables.candlesSql +
      """,
        |r AS (
        |  SELECT user_id, bucket,
        |         round(open, 6) + 0 AS open, round(high, 6) + 0 AS high,
        |         round(low, 6) + 0 AS low,   round(close, 6) + 0 AS close
        |  FROM candles)
        |SELECT user_id, bucket, field, value
        |FROM r UNPIVOT (value FOR field IN (open, high, low, close))""".stripMargin

  // ---------------------------------------------------------------- contracts
  /** DATA-CONTRACT validation census — the pre-ingest gate a pipeline
    * runs against producer guarantees: referential integrity (orders →
    * customer, lineitem → orders, both as anti-join counts), range
    * bounds, enum domains, and non-null requirements, one row per rule
    * with checked/violation counts. All counts are integers — the
    * census is deterministic under any aggregation order — and each
    * anti join broadcasts its key-only dimension side; nothing scans a
    * table twice. The empty-violation result is the CONTRACT: a
    * non-zero row is what pages the producer. */
  def contractCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val ev = Tables.events(spark, dir)
    // every rule on a table rides ONE scan of it (a rule-per-scan census
    // at 100 TB re-reads the fact table once per rule): violation sums
    // for all of a table's rules are columns of a single aggregate,
    // stacked into rows afterwards. FK probes join key-only sides —
    // customer broadcasts into the orders pass; the lineitem pass
    // shuffles once on orderkey (both fact-sized at scale).
    def stack(checked: DataFrame, rules: (String, Column)*): DataFrame = {
      val aggs = rules.zipWithIndex.map { case ((_, bad), i) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"v$i")
      }
      val rows = rules.zipWithIndex
        .map { case ((name, _), i) => s"'$name', v$i" }.mkString(", ")
      checked.agg(count(lit(1)).as("n_checked"), aggs: _*)
        .selectExpr(s"stack(${rules.size}, $rows) AS (rule, n_violations)",
          "n_checked")
        .select(col("rule"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
    }
    stack(o.join(broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left"),
        "orders.custkey_fk" -> col("c_custkey").isNull,
        "orders.totalprice_positive" -> (col("o_totalprice") <= 0),
        "orders.status_enum" -> !col("o_orderstatus").isin("O", "F", "P"))
      .unionByName(stack(l.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left"),
        "lineitem.orderkey_fk" -> col("o_orderkey").isNull,
        "lineitem.discount_range" ->
          (col("l_discount") < 0 || col("l_discount") > 0.5)))
      .unionByName(stack(c,
        "customer.acctbal_range" ->
          (col("c_acctbal") < -1000 || col("c_acctbal") > 10000)))
      .unionByName(stack(ev, "events.value_nonnull" -> col("value").isNull))
  }

  val contractCheckSql: String =
    """SELECT 'orders.custkey_fk' AS rule, count(*) AS n_checked,
      |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |UNION ALL
      |SELECT 'lineitem.orderkey_fk', count(*),
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |UNION ALL
      |SELECT 'orders.totalprice_positive', count(*),
      |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'orders.status_enum', count(*),
      |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'customer.acctbal_range', count(*),
      |  CAST(sum(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 ELSE 0 END) = 0 FROM customer
      |UNION ALL
      |SELECT 'lineitem.discount_range', count(*),
      |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) = 0 FROM lineitem
      |UNION ALL
      |SELECT 'events.value_nonnull', count(*),
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0 FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_star_join"   -> (q3StarJoin _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "reshape_unpivot" -> (reshapeUnpivot _),
    "contract_check" -> (contractCheck _),
    "q1_agg"      -> (q1Agg _),
    "a4_resample" -> (a4Resample _),
    "a4_resample_4h" -> (a4Resample4h _),
    "a4_resample_paged" -> (a4ResamplePaged _))

  def oracles: Map[String, String] = Map(
    "q3_star_join"   -> q3StarJoinSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "reshape_unpivot" -> reshapeUnpivotSql,
    "contract_check" -> contractCheckSql,
    "q1_agg"      -> q1AggSql,
    "a4_resample" -> a4ResampleSql,
    "a4_resample_4h" -> a4Resample4hSql,
    "a4_resample_paged" -> a4PagedSql)
}
