package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Event-analytics invariants on the sf0.001 fixture plus synthetic
  * edge cases the oracle can't isolate: session gap semantics at the
  * exact threshold, strict funnel ordering, SCD2 interval tiling. */
class SessionsSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: no intra-session gap >= 12h, sessions per user separated by >= 12h") {
    val sess = Sessions.sessionize(spark, sfDir).cache()
    // intra-session gaps are <= 12h each, so duration <= (n_events - 1) * 12h
    val bad = sess.filter(col("duration_us") > (col("n_events") - 1) * lit(12L * 3600 * 1000000))
      .filter(col("n_events") > 1)
    assert(bad.count() == 0, "an intra-session gap exceeded the 12h threshold")
    // consecutive sessions of the same user never overlap: start_{k+1} >= end_k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    val overlaps = sess
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end"))
    assert(overlaps.count() == 0, "overlapping sessions for one user")
    // event conservation: session n_events sums to the table row count
    val total = sess.agg(sum(col("n_events"))).head().getLong(0)
    assert(total == graft.Tables.events(spark, sfDir).count())
    sess.unpersist()
  }

  test("sessionize: an exactly-12h gap still merges (inclusive bound); just over splits") {
    import spark.implicits._
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1.0), // session start
      (1L, t("2024-01-01 12:00:00"), 2.0), // exactly 12h later -> MERGES (inclusive)
      (1L, t("2024-01-02 00:00:01"), 3.0), // 12h 1s after prev -> NEW session
      (2L, t("2024-01-01 00:00:00"), 4.0)) // other key never merges
      .toDF("user_id", "ts", "value")
    // exercise the same groupBy directly (fixture has no file for events)
    val sess = ev.groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sess.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("markov attribution recovers hand-computed removal effects on planted journeys") {
    import spark.implicits._
    // u1: view -> click -> purchase; u2: click -> purchase; u3: view (no conv).
    // Chain: start->view 2, start->click 1, view->click 1, view->null 1,
    // click->conv 2. By hand: P(view)=1/2, P(start)=2/3; removing click
    // kills every conversion (effect 1.0); removing view leaves the
    // start->click journey (P drops to 1/3, effect 0.5); signup absent
    // (effect 0). Shares normalize to 2/3 and 1/3 (micro-unit floors).
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-markov").toString)
    def ev(id: Long, uid: Long, minute: Int, tp: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-08-12 10:$minute%02d:00"), uid, tp, 1.0, "{}")
    Seq(
      ev(1, 1, 1, "view"), ev(2, 1, 2, "click"), ev(3, 1, 3, "purchase"),
      ev(4, 2, 1, "click"), ev(5, 2, 2, "purchase"),
      ev(6, 3, 1, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Sessions.attrMarkov(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(out("view") == ((666666L, 500000L, 333333L)), s"view: ${out("view")}")
    assert(out("click") == ((666666L, 1000000L, 666666L)), s"click: ${out("click")}")
    assert(out("signup") == ((666666L, 0L, 0L)), s"signup: ${out("signup")}")
  }

  test("funnel: step counts are monotonically non-increasing and strict ordering is enforced") {
    val rows = Sessions.funnel(spark, sfDir).orderBy("step").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(2))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.mkString(","))
    assert(rows(0).getDouble(3) == 1.0) // first step pct is exactly 1
  }

  test("scd2: intervals tile per user — eff_from strictly increasing, one open interval, no same-tier neighbors") {
    val h = Sessions.scd2History(spark, sfDir).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("eff_from"))
    val flagged = h
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .withColumn("prev_to_us", lag(col("eff_to_us"), 1).over(w))
      .cache()
    // closed intervals chain: previous eff_to == next eff_from
    val broken = flagged.filter(col("prev_to_us").isNotNull &&
      col("prev_to_us") =!= unix_micros(col("eff_from")))
    assert(broken.count() == 0, "interval chain broken")
    // compaction: consecutive records never share a tier
    assert(flagged.filter(col("prev_tier") === col("tier")).count() == 0)
    // exactly one current row per user
    val multiCurrent = h.filter(col("is_current"))
      .groupBy(col("user_id")).count().filter(col("count") =!= 1)
    assert(multiCurrent.count() == 0)
    flagged.unpersist(); h.unpersist()
  }

  test("pivot: row totals equal the per-day event counts (nothing dropped or double-counted)") {
    val p = Sessions.pivotDailyMix(spark, sfDir)
      .withColumn("total",
        col("n_click") + col("n_error") + col("n_purchase") + col("n_signup") + col("n_view"))
    val perDay = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day")).count()
    val joined = p.join(perDay, "day")
    assert(joined.filter(col("total") =!= col("count")).count() == 0)
    assert(p.count() == perDay.count())
  }

  test("cube: the 4 grouping sets are consistent (grand total = sum of each slice)") {
    val c = Sessions.cubeDocs(spark, sfDir).cache()
    val grand = c.filter(col("g_lang") === 1 && col("g_source") === 1)
      .select(col("n_docs")).head().getLong(0)
    val byLang = c.filter(col("g_lang") === 0 && col("g_source") === 1)
      .agg(sum(col("n_docs"))).head().getLong(0)
    val bySource = c.filter(col("g_lang") === 1 && col("g_source") === 0)
      .agg(sum(col("n_docs"))).head().getLong(0)
    val byBoth = c.filter(col("g_lang") === 0 && col("g_source") === 0)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(byLang == grand && bySource == grand && byBoth == grand)
    c.unpersist()
  }
}
