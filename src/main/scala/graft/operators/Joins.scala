package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join operators — SURVEY §2.5. The reference's joins are all equi joins
  * on small keys; the Spark versions broadcast dimension-sized sides so
  * the fact scan never shuffles for them (BroadcastHashJoin), which is
  * the 100 TB-critical choice: lineitem/orders shuffle only for the
  * fact⋈fact join where it's unavoidable (SortMergeJoin on the key, and
  * AQE can still convert to broadcast if one side's runtime size allows).
  */
object Joins {

  /** J1 — enrichment join chain: revenue per nation
    * (view `forex.ohlcv_with_indicators`-style LEFT JOIN enrichment,
    * `02-create-tables.sh`). nation/region are broadcast; the
    * orders⋈lineitem fact join shuffles on the orderkey. */
  def j1Enrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val j1Sql: String =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) + 0 AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** J2 — anti join (the upsert exists-check, `repository.py:42-47,120-129`):
    * customers with no orders. BroadcastHashJoin(LeftAnti) when the right
    * side is small; at scale, a shuffled hash anti join on the key. */
  def j2Anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val j2Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""".stripMargin

  /** J3 — semi join (index-intersection alignment,
    * `feature_importance.py:125-127`): orders having any high-quantity
    * line, counted per status. Semi join emits each left row at most once
    * — no duplicate inflation, cheaper than join+distinct. */
  def j3Semi(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 45).select(col("l_orderkey"))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 4).as("sum_totalprice"))
  }

  val j3Sql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       round(sum(o_totalprice), 4) + 0 AS sum_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderstatus""".stripMargin

  /** U1/U3 — set ops (`data_validator.py:297-325`; `feature_engineer.py:284-306`):
    * union-distinct of two predicate-selected id sets. */
  def u1Union(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val highValue = ev.filter(col("value") > 180).select(col("event_id"), col("user_id"))
    val errors    = ev.filter(col("event_type") === "error").select(col("event_id"), col("user_id"))
    highValue.unionByName(errors).distinct()
  }

  val u1Sql: String =
    """SELECT event_id, user_id FROM events WHERE value > 180
      |UNION
      |SELECT event_id, user_id FROM events WHERE event_type = 'error'""".stripMargin

  /** U3 — history ∪ current-row realtime feature calc
    * (`feature_engineer.py:284-306`): append one synthesized "live"
    * candle per user (next hour, priced at the last close), recompute the
    * rolling feature over the union, and emit only the live rows — the
    * incremental-feature shape. The union is narrow (no shuffle); the
    * window reuses the same (user_id, bucket) exchange as every other
    * indicator. */
  def u3UnionCurrent(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.candles(spark, dir).withColumn("is_current", lit(false))
    val current = Tables.candles(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("bucket")).as("b"), max_by(col("close"), col("bucket")).as("lc"))
      .select(col("user_id"), (col("b") + expr("INTERVAL 1 HOUR")).as("bucket"),
        col("lc").as("open"), col("lc").as("high"), col("lc").as("low"),
        col("lc").as("close"), lit(0L).as("volume"), lit(true).as("is_current"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("bucket")).rowsBetween(-4, 0)
    hist.unionByName(current)
      .withColumn("sma_5",
        when(count(col("close")).over(w) === 5, round(avg(col("close")).over(w), 6)))
      .filter(col("is_current"))
      .select(col("user_id"), col("bucket"), round(col("close"), 6).as("close"), col("sma_5"))
  }

  val u3Sql: String = Tables.candlesSql +
    """, cur AS (
      |  SELECT user_id, max(bucket) + INTERVAL 1 HOUR AS bucket,
      |         arg_max(close, bucket) AS lc
      |  FROM candles GROUP BY user_id),
      |unioned AS (
      |  SELECT user_id, bucket, close, FALSE AS is_current FROM candles
      |  UNION ALL
      |  SELECT user_id, bucket, lc AS close, TRUE AS is_current FROM cur),
      |f AS (
      |  SELECT user_id, bucket, close, is_current,
      |    CASE WHEN count(close) OVER w5 = 5 THEN round(avg(close) OVER w5, 6) END AS sma_5
      |  FROM unioned
      |  WINDOW w5 AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
      |SELECT user_id, bucket, round(close, 6) + 0 AS close, sma_5
      |FROM f WHERE is_current""".stripMargin

  /** J5 — salt-replicated skew join, the 100 TB pattern for a hot key
    * (one currency pair / one user dominating the fact table; AQE's
    * skew-join split handles moderate skew, salting is the explicit
    * form for the pathological case). The skewed FACT side tags each
    * row with a deterministic salt in 0..R-1; the smaller (but not
    * broadcastable) side replicates ×R via explode; the join key grows
    * to (key, salt) so one hot key spreads over R reducers. `merge`
    * hint forces the shuffle-join shape the technique exists for —
    * result is identical to the unsalted join (the oracle is the plain
    * join). Aggregated per status so the surface is stable. */
  def j5SkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val R = 8
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_linenumber"), lit(R)))
    val o = Tables.orders(spark, dir)
      .withColumn("salt", explode(sequence(lit(0), lit(R - 1))))
    li.hint("merge")
      .join(o, li("salt") === o("salt") && li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
  }

  val j5Sql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      |       round(sum(l_extendedprice), 4) + 0 AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- as-of join
  /** J6 — AS-OF JOIN: every tick picks the most recent hourly bar open
    * at or before its timestamp, per key — the reference's
    * enrich-tick-with-last-indicator lookup generalized to the operator
    * Spark famously lacks. Implemented the Spark-native way: UNION the
    * two streams with a kind tag (bar=0, tick=1 — a bar AT the tick's
    * instant is visible to it), one `last(_, ignoreNulls)` running
    * window per key over (ts, kind), then keep the tick rows. One
    * shuffle on the key, zero join fan-out, no per-key state — at
    * 100 TB this is strictly cheaper than the windowed equi-join
    * rewrite (no duplicate-bucket explosion) and never materializes a
    * pair that loses the as-of race. Staleness is microsecond-exact
    * (`unix_micros`), matching DuckDB's `epoch_us`. */
  def j6AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), lit(1).as("kind"), col("value"),
        lit(null).cast("double").as("bar_open"))
    val bars = Tables.candles(spark, dir)
      .select(col("user_id"), col("bucket").as("ts"), lit(0).as("kind"),
        lit(null).cast("double").as("value"), col("open").as("bar_open"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("kind"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ticks.unionByName(bars)
      .withColumn("last_open", last(col("bar_open"), ignoreNulls = true).over(w))
      .withColumn("last_bar_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("ts"), col("value"),
        col("last_open").as("bar_open"),
        (unix_micros(col("ts")) - unix_micros(col("last_bar_ts"))).as("staleness_us"))
  }

  val j6Sql: String =
    Tables.candlesSql + """,
      |merged AS (
      |  SELECT user_id, ts, 1 AS kind, value, NULL::DOUBLE AS bar_open
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, bucket, 0, NULL, open FROM candles),
      |f AS (
      |  SELECT user_id, ts, kind, value,
      |    last_value(bar_open IGNORE NULLS) OVER wj6 AS last_open,
      |    last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER wj6 AS last_bar_ts
      |  FROM merged
      |  WINDOW wj6 AS (PARTITION BY user_id ORDER BY ts, kind
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, ts, value, last_open AS bar_open,
      |       epoch_us(ts) - epoch_us(last_bar_ts) AS staleness_us
      |FROM f WHERE kind = 1""".stripMargin

  // ---------------------------------------------------------------- range join
  /** J7 — RANGE (interval) JOIN: events falling inside each volatile
    * window — per key, days whose value range exceeds 100 open a
    * 6-hour interval from the day's first event, and every event with
    * `start ≤ ts ≤ end` lands in it. A naive theta-join is O(events ×
    * intervals) — Spark would nested-loop it; instead each interval
    * EXPLODES into its ≤7 covering hour buckets and the join is an
    * EQUI join on (key, hour bucket) + residual range filter: the
    * standard banding rewrite that turns an unbounded cross product
    * into bounded fan-out (intervals × 7 rows), shuffle-partitioned by
    * the same key as the events. Intervals are per (key, day) and 6 h
    * < 24 h, so they never overlap and no post-join dedup is needed.
    * Output: per-interval occupancy census. */
  def j7RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val iv = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(min(col("ts")).as("start_ts"),
        (max(col("value")) - min(col("value"))).as("rng"))
      .filter(col("rng") > 100)
      .select(col("user_id"), col("start_ts"),
        (col("start_ts") + expr("INTERVAL 6 HOURS")).as("end_ts"))
    val ivBuckets = iv.withColumn("hb",
      explode(sequence(date_trunc("hour", col("start_ts")),
        date_trunc("hour", col("end_ts")), expr("INTERVAL 1 HOUR"))))
    ev.withColumn("hb", date_trunc("hour", col("ts")))
      .join(ivBuckets, Seq("user_id", "hb"))
      .filter(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .groupBy(col("user_id"), col("start_ts"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 6).as("avg_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
  }

  val j7Sql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |         min(ts) AS start_ts, max(value) - min(value) AS rng
      |  FROM events GROUP BY 1, 2),
      |iv AS (
      |  SELECT user_id, start_ts, start_ts + INTERVAL 6 HOUR AS end_ts
      |  FROM daily WHERE rng > 100)
      |SELECT e.user_id, i.start_ts, count(*) AS n_events,
      |       round(avg(e.value), 6) + 0 AS avg_value,
      |       min(e.ts) AS first_ts, max(e.ts) AS last_ts
      |FROM events e JOIN iv i
      |  ON e.user_id = i.user_id AND e.ts >= i.start_ts AND e.ts <= i.end_ts
      |GROUP BY 1, 2""".stripMargin

  /** J6 again, through the custom whole-operator path: the
    * [[graft.plans.AsOfJoinPlan]] logical node lowered by
    * [[graft.plans.AsOfJoinStrategy]] to the one-pass merge exec —
    * same tick→bar attachment as [[j6AsofJoin]]'s union+window
    * composition, but each side shuffles/sorts once and the walk keeps
    * O(1) state instead of a full-frame window. The filter on the
    * result exercises [[graft.plans.PushLeftFilterThroughAsOf]]
    * (left-only predicates reach the scan — plan-asserted in
    * AsOfJoinSpec). */
  def j8AsofExec(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
    val bars = Tables.candles(spark, dir)
      .select(col("user_id").as("bar_user"), col("bucket").as("bar_ts"),
        col("open").as("bar_open"))
    graft.plans.AsOfJoinOps.asof(
        ticks, bars, Seq("user_id"), Seq("bar_user"), "ts", "bar_ts")
      .filter(col("user_id") <= 100)
      .select(col("user_id"), col("ts"),
        round(col("value"), 6).as("value"),
        round(col("bar_open"), 6).as("bar_open"),
        (unix_micros(col("ts")) - unix_micros(col("bar_ts"))).as("staleness_us"))
  }

  val j8Sql: String =
    Tables.candlesSql + """
      |SELECT e.user_id, e.ts, round(e.value, 6) + 0 AS value,
      |       round(c.open, 6) + 0 AS bar_open,
      |       epoch_us(e.ts) - epoch_us(c.bucket) AS staleness_us
      |FROM events e ASOF LEFT JOIN candles c
      |  ON e.user_id = c.user_id AND e.ts >= c.bucket
      |WHERE e.user_id <= 100""".stripMargin

  /** J8 with a STALENESS CAP: a bar older than 30 min no longer speaks
    * for the tick (`toleranceUs` on [[graft.plans.AsOfJoinOps.asof]]) —
    * the match nulls out instead of silently carrying stale context.
    * DuckDB oracle = native ASOF LEFT JOIN + CASE on the staleness. */
  def j9AsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val tolUs = 30L * 60 * 1000 * 1000
    val ticks = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
    val bars = Tables.candles(spark, dir)
      .select(col("user_id").as("bar_user"), col("bucket").as("bar_ts"),
        col("open").as("bar_open"))
    graft.plans.AsOfJoinOps.asof(
        ticks, bars, Seq("user_id"), Seq("bar_user"), "ts", "bar_ts",
        toleranceUs = Some(tolUs))
      .select(col("user_id"), col("ts"),
        round(col("value"), 6).as("value"),
        round(col("bar_open"), 6).as("bar_open"),
        (unix_micros(col("ts")) - unix_micros(col("bar_ts"))).as("staleness_us"))
  }

  val j9Sql: String =
    Tables.candlesSql + """
      |SELECT e.user_id, e.ts, round(e.value, 6) + 0 AS value,
      |       CASE WHEN epoch_us(e.ts) - epoch_us(c.bucket) <= 1800000000
      |            THEN round(c.open, 6) + 0 END AS bar_open,
      |       CASE WHEN epoch_us(e.ts) - epoch_us(c.bucket) <= 1800000000
      |            THEN epoch_us(e.ts) - epoch_us(c.bucket) END AS staleness_us
      |FROM events e ASOF LEFT JOIN candles c
      |  ON e.user_id = c.user_id AND e.ts >= c.bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j7_range_join"  -> (j7RangeJoin _),
    "j6_asof_join"   -> (j6AsofJoin _),
    "j8_asof_exec"   -> (j8AsofExec _),
    "j9_asof_tolerance" -> (j9AsofTolerance _),
    "j5_skew_salted" -> (j5SkewSalted _),
    "j1_enrich_join" -> (j1Enrich _),
    "j2_anti_join"   -> (j2Anti _),
    "j3_semi_join"   -> (j3Semi _),
    "u1_union"       -> (u1Union _),
    "u3_union_current" -> (u3UnionCurrent _))

  def oracles: Map[String, String] = Map(
    "j7_range_join"  -> j7Sql,
    "j6_asof_join"   -> j6Sql,
    "j8_asof_exec"   -> j8Sql,
    "j9_asof_tolerance" -> j9Sql,
    "j5_skew_salted" -> j5Sql,
    "j1_enrich_join" -> j1Sql,
    "j2_anti_join"   -> j2Sql,
    "j3_semi_join"   -> j3Sql,
    "u1_union"       -> u1Sql,
    "u3_union_current" -> u3Sql)
}
