package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators — the standard clickstream suite a lakehouse
  * engine is expected to ship alongside the reference's time-series surface
  * (the reference's stream channels are per-client event feeds,
  * `app/services/websocket_manager.py:200-267`; these are the batch
  * analytics those feeds imply): sessionization, ordered funnels, cohort
  * retention, a pivoted activity matrix, CUBE totals, and an SCD2
  * dimension-history build.
  *
  * Scale shape: every query here shuffles at most once on `user_id` (or
  * the group key) — sessionization uses Spark's native `session_window`
  * aggregate (state-store-backed in streaming, sort-merge in batch), the
  * funnel and cohort passes reuse one per-user window exchange, and the
  * pivot pins its column set so Catalyst emits a single-pass aggregate
  * with no distinct-values pre-job.
  */
object Sessions {

  // ------------------------------------------------------------ sessionize
  /** Sessionization via `session_window(ts, gap)` — the Spark-native
    * operator: a session ends only after MORE than 12 h of inactivity
    * (the merge bound is inclusive — see SessionsSpec); end = last
    * ts + gap.
    * Identical semantics to the streaming form with a watermark, so this
    * one definition serves batch backfill and the live channel. One
    * shuffle on user_id; session merging is per-key and never compares
    * events across keys. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionAggregate(Tables.events(spark, dir), "12 hours")

  /** The session aggregation itself, shared VERBATIM by the batch query
    * above and the streaming form (pass a watermarked streaming frame —
    * `SessionStreamSpec` pins that both paths emit identical sessions):
    * one declarative plan, two execution modes. */
  def sessionAggregate(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"), col("duration_us"))

  /** Gaps-and-islands oracle: break only when the inter-event gap EXCEEDS
    * 12 h — session_window's merge bound is inclusive (an event exactly
    * gap after the previous one still merges; pinned in SessionsSpec).
    * Island id = running sum of breaks, session_end = last ts + gap. */
  val sessionizeSql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 12 HOUR THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id,
      |       min(ts) AS session_start,
      |       max(ts) + INTERVAL 12 HOUR AS session_end,
      |       count(*) AS n_events,
      |       round(sum(value), 6) + 0 AS sum_value,
      |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      |FROM s GROUP BY user_id, sid""".stripMargin

  // ---------------------------------------------------------------- funnel
  /** Ordered funnel view → click → purchase: each step must occur STRICTLY
    * after the user's first completion of the previous step. Running
    * per-user `min(when(...))` windows carry the first-view and first-
    * qualified-click timestamps forward, so the whole funnel is two window
    * passes over one user_id exchange and a final 3-row rollup — no
    * self-joins (the naive per-step join chain is k−1 shuffles and
    * explodes on users with many events). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val s1 = Tables.events(spark, dir)
      .withColumn("cv", min(when(col("event_type") === "view", col("ts"))).over(run))
    val s2 = s1.withColumn("ck",
      min(when(col("event_type") === "click" && col("cv") < col("ts"), col("ts"))).over(run))
    val perUser = s2.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "view", 1).otherwise(0)).as("s_view"),
      max(when(col("event_type") === "click" && col("cv") < col("ts"), 1).otherwise(0)).as("s_click"),
      max(when(col("event_type") === "purchase" && col("ck") < col("ts"), 1).otherwise(0)).as("s_purchase"))
    val steps = perUser.agg(
      sum(col("s_view")).as("n_view"),
      sum(col("s_click")).as("n_click"),
      sum(col("s_purchase")).as("n_purchase"))
    steps.select(expr(
      "stack(3, 1, 'view', n_view, 2, 'click', n_click, 3, 'purchase', n_purchase) " +
        "AS (step, step_name, n_users)"))
      .withColumn("pct_of_first",
        round(col("n_users") / first(col("n_users")).over(
          Window.orderBy(col("step")).rowsBetween(Window.unboundedPreceding, 0)), 6))
  }

  val funnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'view' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS cv
      |  FROM events),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND cv < ts THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS ck
      |  FROM s1),
      |u AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s_view,
      |    max(CASE WHEN event_type = 'click' AND cv < ts THEN 1 ELSE 0 END) AS s_click,
      |    max(CASE WHEN event_type = 'purchase' AND ck < ts THEN 1 ELSE 0 END) AS s_purchase
      |  FROM s2 GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(s_view) AS BIGINT) AS n_view,
      |         CAST(sum(s_click) AS BIGINT) AS n_click,
      |         CAST(sum(s_purchase) AS BIGINT) AS n_purchase
      |  FROM u),
      |f AS (
      |  SELECT 1 AS step, 'view' AS step_name, n_view AS n_users FROM t
      |  UNION ALL SELECT 2, 'click', n_click FROM t
      |  UNION ALL SELECT 3, 'purchase', n_purchase FROM t)
      |SELECT step, step_name, n_users,
      |       round(n_users / first_value(n_users) OVER
      |         (ORDER BY step ROWS UNBOUNDED PRECEDING), 6) + 0 AS pct_of_first
      |FROM f""".stripMargin

  // ------------------------------------------------------ cohort retention
  /** Weekly cohort-retention matrix: cohort = Monday of each user's first
    * event week, offset = whole weeks since first DAY, cell = distinct
    * active users. `first_ts` comes from a running window min on the SAME
    * user_id exchange the other event queries use — no join against a
    * first-seen table (the join would shuffle the fact twice at 100 TB). */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .withColumn("first_ts", min(col("ts")).over(wAll))
      .select(
        date_trunc("week", col("first_ts")).as("cohort_week"),
        floor(datediff(to_date(col("ts")), to_date(col("first_ts"))) / 7).as("week_offset"),
        col("user_id"), col("event_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  val retentionSql: String =
    """WITH f AS (
      |  SELECT *, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM events)
      |SELECT date_trunc('week', first_ts) AS cohort_week,
      |       date_diff('day', first_ts::DATE, ts::DATE) // 7 AS week_offset,
      |       count(DISTINCT user_id) AS n_users,
      |       count(*) AS n_events
      |FROM f GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------------- pivot
  /** Daily activity matrix: one row per day, one count column per event
    * type. The pivot values are PINNED (`Seq("click",...)`) so Catalyst
    * plans a single-pass pivot aggregate — an unpinned pivot first runs a
    * distinct-values job over the whole table, a hidden extra scan at
    * 100 TB (and nondeterministic columns if a new type appears). */
  def pivotDailyMix(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .select(col("day") +: types.map(t => col(t).as(s"n_$t")): _*)
  }

  val pivotSql: String =
    """SELECT date_trunc('day', ts) AS day,
      |  count(*) FILTER (event_type = 'click')    AS n_click,
      |  count(*) FILTER (event_type = 'error')    AS n_error,
      |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (event_type = 'signup')   AS n_signup,
      |  count(*) FILTER (event_type = 'view')     AS n_view
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------ cube
  /** CUBE over (lang, source) on documents — all four grouping-set
    * combinations in ONE pass (Catalyst's Expand: 4× row replication into
    * the same hash aggregate, vs 4 scans for the UNION rewrite).
    * `grouping()` flags disambiguate real NULLs from subtotal rows;
    * labels are coalesced so the report schema is non-null. Companion to
    * `a5_rollup` (time hierarchy) — this is the ad-hoc-slice flavor. */
  def cubeDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        grouping(col("lang")).as("g_lang"),
        grouping(col("source")).as("g_source"))
      .select(coalesce(col("lang"), lit("(all)")).as("lang"),
        coalesce(col("source"), lit("(all)")).as("source"),
        col("g_lang"), col("g_source"), col("n_docs"), col("sum_chars"))

  val cubeSql: String =
    """SELECT coalesce(lang, '(all)') AS lang,
      |       coalesce(source, '(all)') AS source,
      |       GROUPING(lang) AS g_lang, GROUPING(source) AS g_source,
      |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY CUBE(lang, source)""".stripMargin

  // ------------------------------------------------------------------ scd2
  /** SCD2 dimension-history build: each user's tier (value band at their
    * `signup` events) becomes validity intervals [eff_from, eff_to) with
    * an is_current flag — the change-data-capture → dimension-table
    * compaction every warehouse runs. Change detection (`tier ≠ lag`)
    * and interval close (`lead`) are two windows on one user_id exchange;
    * consecutive same-tier records compact away, so output size is the
    * number of CHANGES, not events. eff_to is epoch-µs (NULL for open
    * intervals) to keep the report schema join-friendly. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val tiers = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .withColumn("tier",
        when(col("value") < 50, "bronze")
          .when(col("value") < 150, "silver")
          .otherwise("gold"))
    val changes = tiers
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .filter(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
    changes
      .withColumn("eff_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("tier"),
        col("ts").as("eff_from"),
        unix_micros(col("eff_to")).as("eff_to_us"),
        col("eff_to").isNull.as("is_current"))
  }

  val scd2Sql: String =
    """WITH t AS (
      |  SELECT user_id, ts,
      |    CASE WHEN value < 50 THEN 'bronze'
      |         WHEN value < 150 THEN 'silver' ELSE 'gold' END AS tier
      |  FROM events WHERE event_type = 'signup'),
      |c AS (
      |  SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev_tier
      |  FROM t),
      |ch AS (
      |  SELECT user_id, ts, tier FROM c
      |  WHERE prev_tier IS NULL OR prev_tier <> tier)
      |SELECT user_id, tier, ts AS eff_from,
      |       epoch_us(lead(ts) OVER w) AS eff_to_us,
      |       lead(ts) OVER w IS NULL AS is_current
      |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin

  // ----------------------------------------------------------- path mining
  /** Top-10 event trigram paths: the per-user ordered lead×2 sequence
    * assembly (one user_id window exchange, the same one the funnel uses)
    * followed by a global count + top-k. Ordering within a user is
    * (ts, event_id) so simultaneous events can't flip paths between runs
    * or engines. At 100 TB the trigram table is the only shuffle after
    * the window and is bounded by |event_type|³ distinct keys. */
  def pathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  val pathTrigramsSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  // ------------------------------------------------------------ attribution
  /** Multi-touch attribution: each purchase is a conversion; the touches
    * (view/click/signup) since the user's previous purchase share its
    * credit under four standard models — first-touch, last-touch, linear,
    * and position-based (40/20/40). Conversion grouping is a REVERSE
    * running count of purchases (`rows current→unbounded following`) on
    * the per-user exchange: every row with the same (user, conv_after≥1)
    * belongs to the purchase that closes the group — no self-join against
    * a conversions table, which would shuffle the event stream twice. */
  def attrTouch(spark: SparkSession, dir: String): DataFrame = {
    // reverse running count (desc order, unboundedPreceding→current) ≡
    // count over current→unboundedFollowing, but O(p) per partition
    // instead of Spark's O(p²) tail re-aggregation for FOLLOWING frames
    val after = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val touches = Tables.events(spark, dir)
      .withColumn("conv_after",
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).over(after))
      .filter(col("event_type").isin("view", "click", "signup") && col("conv_after") >= 1)
    val grp = Window.partitionBy(col("user_id"), col("conv_after"))
    val grpOrd = grp.orderBy(col("ts"), col("event_id"))
    touches
      .withColumn("pos", row_number().over(grpOrd))
      .withColumn("n", count(lit(1)).over(grp))
      .withColumn("first_credit", when(col("pos") === 1, 1.0).otherwise(0.0))
      .withColumn("last_credit", when(col("pos") === col("n"), 1.0).otherwise(0.0))
      .withColumn("linear_credit", lit(1.0) / col("n"))
      .withColumn("pos_credit",
        when(col("n") === 1, 1.0)
          .when(col("n") === 2, 0.5)
          .when(col("pos") === 1 || col("pos") === col("n"), 0.4)
          .otherwise(lit(0.2) / (col("n") - 2)))
      .groupBy(col("event_type").as("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        round(sum(col("first_credit")), 6).as("first_touch"),
        round(sum(col("last_credit")), 6).as("last_touch"),
        round(sum(col("linear_credit")), 6).as("linear"),
        round(sum(col("pos_credit")), 6).as("position_based"))
  }

  val attrTouchSql: String =
    """WITH c AS (
      |  SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_after
      |  FROM events),
      |t AS (
      |  SELECT user_id, conv_after, event_type,
      |    row_number() OVER (PARTITION BY user_id, conv_after ORDER BY ts, event_id) AS pos,
      |    count(*) OVER (PARTITION BY user_id, conv_after) AS n
      |  FROM c
      |  WHERE event_type IN ('view', 'click', 'signup') AND conv_after >= 1),
      |cr AS (
      |  SELECT event_type AS channel,
      |    CASE WHEN pos = 1 THEN 1.0 ELSE 0.0 END AS first_credit,
      |    CASE WHEN pos = n THEN 1.0 ELSE 0.0 END AS last_credit,
      |    1.0 / n AS linear_credit,
      |    CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
      |         WHEN pos = 1 OR pos = n THEN 0.4
      |         ELSE 0.2 / (n - 2) END AS pos_credit
      |  FROM t)
      |SELECT channel, count(*) AS n_touches,
      |  round(sum(first_credit), 6) + 0 AS first_touch,
      |  round(sum(last_credit), 6) + 0  AS last_touch,
      |  round(sum(linear_credit), 6) + 0 AS linear,
      |  round(sum(pos_credit), 6) + 0   AS position_based
      |FROM cr GROUP BY channel""".stripMargin

  // ---------------------------------------------------------------- markov
  /** MARKOV removal-effect attribution — the data-driven counterpart to
    * [[attrTouch]]'s heuristic credits: model journeys as a first-order
    * chain over channels with absorbing conv/null states, and credit
    * each channel by how much the start→conv absorption probability
    * drops when the channel is removed (its edges redirect to null),
    * normalized across channels.
    *
    * Determinism design (the [[graft.scale.GraphOps]] fixed-point
    * argument): transition mass and the 100-step value iteration run in
    * BIGINT micro-units with integer division, so the numbers are
    * bit-exact on any engine and any partitioning — float absorption
    * solves are summation-order-sensitive and couldn't be hash-oracled.
    * Scale shape: transition counts are one windowed pass + a hash
    * aggregate over the events table (the only corpus-sized work); the
    * chain itself is (channels+3)² counts — fit-sized — so the four
    * value iterations run driver-side, exactly like the k-means/PCA
    * driver tails. */
  def attrMarkov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val channels = Seq("view", "click", "signup")
    // reverse running count — see [[attrTouch]]'s frame note
    val after = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ev = Tables.events(spark, dir)
      .withColumn("conv_after",
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).over(after))
    val jw = Window.partitionBy(col("user_id"), col("conv_after"))
      .orderBy(col("ts"), col("event_id"))
    val touches = ev.filter(col("event_type").isin(channels.map(lit): _*))
      .withColumn("pos", row_number().over(jw))
      .withColumn("nxt", lead(col("event_type"), 1).over(jw))
      .withColumn("dst", coalesce(col("nxt"),
        when(col("conv_after") >= 1, lit("conv")).otherwise(lit("null"))))
    val edgeRows = touches.filter(col("pos") === 1)
      .select(lit("start").as("src"), col("event_type").as("dst"))
      .unionByName(touches.select(col("event_type").as("src"), col("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // journeys with zero touches absorb straight from start: one per
    // purchase not preceded by any touch inside its own journey. The
    // touched-journey count needs no second corpus pass: every
    // converting journey with >= 1 touch contributes exactly one
    // edge into 'conv' (its last touch), already in the collected map
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    val nTouchedConv = edgeRows.collect { case ((_, "conv"), n) => n }.sum
    val counts = if (nPurch > nTouchedConv)
      edgeRows + (("start", "conv") ->
        (edgeRows.getOrElse(("start", "conv"), 0L) + nPurch - nTouchedConv))
    else edgeRows
    // 100-step integer value iteration; removal redirects edges into the
    // removed channel to null (they keep their slot in the denominator)
    def absorb(removed: Option[String]): Long = {
      val states = "start" +: channels.filterNot(removed.contains)
      val out = states.map(s =>
        s -> counts.collect { case ((a, _), n) if a == s => n }.sum).toMap
      var p = states.map(_ -> 0L).toMap
      for (_ <- 1 to 100) {
        p = states.map { s =>
          val num = counts.collect { case ((a, b), n) if a == s =>
            n * (if (b == "conv") 1000000L
                 else if (b == "null" || removed.contains(b)) 0L
                 else p.getOrElse(b, 0L))
          }.sum
          s -> (if (out(s) == 0) 0L else num / out(s))
        }.toMap
      }
      p("start")
    }
    val pFull = absorb(None)
    val eff = channels.map { ch =>
      val pRem = absorb(Some(ch))
      val effU = if (pFull > 0) (pFull - pRem) * 1000000L / pFull else 0L
      (ch, pRem, effU)
    }
    val effSum = eff.map(_._3).sum
    eff.map { case (ch, pRem, effU) =>
      val share = if (effSum > 0) effU * 1000000L / effSum else 0L
      (ch, pFull, pRem, effU, share)
    }.toDF("channel", "p_full_units", "p_removed_units", "effect_units", "share_units")
      .select(col("channel"), col("p_full_units"), col("p_removed_units"),
        col("effect_units"), col("share_units"),
        round(col("p_full_units") / 1e6, 6).as("p_conv"),
        round(col("effect_units") / 1e6, 6).as("removal_effect"),
        round(col("share_units") / 1e6, 6).as("attribution_share"))
  }

  /** Oracle: the same counts, the same 100-step micro-unit iteration as
    * one recursive CTE over (scenario, state) — the recursive member
    * sees only the previous step's rows, which IS the value-iteration
    * frontier (same machinery as the k-core peel oracle). */
  val attrMarkovSql: String =
    """WITH RECURSIVE c AS (
      |  SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_after
      |  FROM events),
      |mtt AS (
      |  SELECT user_id, conv_after, event_type AS src,
      |    row_number() OVER mw AS pos,
      |    lead(event_type) OVER mw AS nxt
      |  FROM c WHERE event_type IN ('view', 'click', 'signup')
      |  WINDOW mw AS (PARTITION BY user_id, conv_after ORDER BY ts, event_id)),
      |base_edges AS (
      |  SELECT 'start' AS src, src AS dst, count(*) AS cnt FROM mtt WHERE pos = 1 GROUP BY 2
      |  UNION ALL
      |  SELECT src, coalesce(nxt, CASE WHEN conv_after >= 1 THEN 'conv' ELSE 'null' END), count(*)
      |  FROM mtt GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'start', 'conv',
      |    (SELECT count(*) FROM c WHERE event_type = 'purchase')
      |    - (SELECT count(DISTINCT (user_id, conv_after)) FROM mtt WHERE conv_after >= 1)),
      |medges AS MATERIALIZED (
      |  SELECT src, dst, CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM base_edges WHERE cnt > 0 GROUP BY 1, 2),
      |mscn(scn) AS (SELECT * FROM (VALUES ('full'), ('view'), ('click'), ('signup'))),
      |mstatics AS MATERIALIZED (
      |  SELECT s.scn, st.state AS src,
      |    coalesce((SELECT CAST(sum(cnt) AS BIGINT) FROM medges e WHERE e.src = st.state), 0) AS outn,
      |    coalesce((SELECT CAST(sum(cnt) AS BIGINT) FROM medges e
      |              WHERE e.src = st.state AND e.dst = 'conv'), 0) * 1000000 AS conv_c
      |  FROM mscn s, (VALUES ('start'), ('view'), ('click'), ('signup')) st(state)
      |  WHERE st.state <> s.scn),
      |mtedges AS MATERIALIZED (
      |  SELECT s.scn, e.src, e.dst, e.cnt
      |  FROM mscn s JOIN medges e
      |    ON e.dst IN ('view', 'click', 'signup')
      |   AND e.dst <> s.scn AND e.src <> s.scn),
      |vi(iter, scn, state, p) AS (
      |  SELECT 0, scn, src, 0::BIGINT FROM mstatics
      |  UNION ALL
      |  SELECT v0.iter + 1, s.scn, s.src,
      |    CAST((s.conv_c + coalesce(sum(te.cnt * tv.p), 0)) // greatest(s.outn, 1) AS BIGINT)
      |  FROM mstatics s
      |  JOIN (SELECT DISTINCT iter FROM vi) v0 ON v0.iter < 100
      |  LEFT JOIN mtedges te ON te.scn = s.scn AND te.src = s.src
      |  LEFT JOIN vi tv ON tv.scn = te.scn AND tv.state = te.dst
      |  GROUP BY v0.iter, s.scn, s.src, s.conv_c, s.outn),
      |fin AS (SELECT scn, p FROM vi WHERE iter = 100 AND state = 'start'),
      |meff AS (
      |  SELECT ch.c AS channel,
      |    (SELECT p FROM fin WHERE scn = 'full') AS p_full_units,
      |    (SELECT p FROM fin WHERE scn = ch.c) AS p_removed_units
      |  FROM (VALUES ('view'), ('click'), ('signup')) ch(c)),
      |meff2 AS (
      |  SELECT channel, p_full_units, p_removed_units,
      |    CASE WHEN p_full_units > 0
      |      THEN ((p_full_units - p_removed_units) * 1000000) // p_full_units
      |      ELSE 0 END AS effect_units
      |  FROM meff)
      |SELECT channel, p_full_units, p_removed_units, effect_units,
      |  CASE WHEN (SELECT sum(effect_units) FROM meff2) > 0
      |    THEN (effect_units * 1000000) // (SELECT CAST(sum(effect_units) AS BIGINT) FROM meff2)
      |    ELSE 0 END AS share_units,
      |  round(p_full_units / 1e6, 6) + 0 AS p_conv,
      |  round(effect_units / 1e6, 6) + 0 AS removal_effect,
      |  round(CASE WHEN (SELECT sum(effect_units) FROM meff2) > 0
      |    THEN (effect_units * 1000000) // (SELECT CAST(sum(effect_units) AS BIGINT) FROM meff2)
      |    ELSE 0 END / 1e6, 6) + 0 AS attribution_share
      |FROM meff2""".stripMargin

  // ---------------------------------------------------------------- assoc
  /** ASSOCIATION RULES over daily user baskets — market-basket lift on
    * event types: a basket is the distinct set of event types one user
    * produced in one day, and each ordered type pair (a → b) reports
    * support, confidence, and lift. Lift > 1 = co-occurring beyond
    * independence — the cross-sell / next-action signal.
    *
    * Counts stay INTEGERS until the final projection (cross-engine
    * deterministic regardless of aggregation order); the divisions are
    * rounded once at the edge. Scale shape: the basket table is
    * (users × days), the pair self-join runs per basket over ≤|types|
    * items — with a large item vocabulary the standard frequent-item
    * prefilter (drop items below min-support BEFORE pairing) bounds
    * the blowup; here the type domain is tiny so pairs ≤ C(5,2). */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
    val n = baskets.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = baskets.groupBy(col("event_type")).agg(count(lit(1)).as("n_item"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.day") === col("b.day") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("item_a"), col("b.event_type").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(itemN.select(col("event_type").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemN.select(col("event_type").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab") / col("n_baskets"), 6).as("support"),
        round(col("n_ab") / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  val assocRulesSql: String =
    """WITH bk AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      |  FROM events),
      |nb AS (SELECT count(*) AS n_baskets
      |       FROM (SELECT DISTINCT user_id, day FROM bk)),
      |it AS (SELECT event_type, count(*) AS n_item FROM bk GROUP BY event_type),
      |pr AS (
      |  SELECT a.event_type AS item_a, b.event_type AS item_b, count(*) AS n_ab
      |  FROM bk a JOIN bk b
      |    ON a.user_id = b.user_id AND a.day = b.day
      |   AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT p.item_a, p.item_b, p.n_ab,
      |  ia.n_item AS n_a, ib.n_item AS n_b,
      |  round(p.n_ab * 1.0 / nb.n_baskets, 6) + 0 AS support,
      |  round(p.n_ab * 1.0 / ia.n_item, 6) + 0 AS confidence,
      |  round(p.n_ab * 1.0 * nb.n_baskets / (ia.n_item * ib.n_item), 6) + 0 AS lift
      |FROM pr p
      |JOIN it ia ON ia.event_type = p.item_a
      |JOIN it ib ON ib.event_type = p.item_b, nb""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assoc_rules"       -> (assocRules _),
    "sess_sessionize"   -> (sessionize _),
    "sess_funnel"       -> (funnel _),
    "retention_cohorts" -> (retentionCohorts _),
    "pivot_daily_mix"   -> (pivotDailyMix _),
    "cube_docs"         -> (cubeDocs _),
    "scd2_history"      -> (scd2History _),
    "path_trigrams"     -> (pathTrigrams _),
    "attr_touch"        -> (attrTouch _),
    "attr_markov"       -> (attrMarkov _))

  def oracles: Map[String, String] = Map(
    "assoc_rules"       -> assocRulesSql,
    "sess_sessionize"   -> sessionizeSql,
    "sess_funnel"       -> funnelSql,
    "retention_cohorts" -> retentionSql,
    "pivot_daily_mix"   -> pivotSql,
    "cube_docs"         -> cubeSql,
    "scd2_history"      -> scd2Sql,
    "path_trigrams"     -> pathTrigramsSql,
    "attr_touch"        -> attrTouchSql,
    "attr_markov"       -> attrMarkovSql)
}
