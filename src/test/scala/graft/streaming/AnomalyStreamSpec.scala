package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming anomaly scorer end-to-end: events join the batch-fitted
  * profile, extreme values flag, windows finalize under the watermark,
  * and a slot missing from the profile scores not-anomalous. */
class AnomalyStreamSpec extends SparkSpec {

  test("stream flags 3-sigma outliers against the batch profile and counts per window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // profile fitted in BATCH: type 'click' hour 0 has mu=10 sigma=1;
    // 'view' has no profile row (unseen in reference window)
    val profile = Seq(("click", 0, 100L, 10.0, 1.0))
      .toDF("event_type", "hod", "n_ref", "mu", "sigma")
    // hour-0 timestamps: epoch 0 + s seconds is 1970-01-01 00:xx UTC
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = AnomalyStream.score(
        mem.toDF().toDF("event_id", "ts", "event_type", "value"), profile)
      .writeStream.format("memory").queryName("anom_t")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, ts(10), "click", 10.5),  // normal: |10.5-10| <= 3
        (2L, ts(20), "click", 20.0),  // anomaly: |20-10| > 3
        (3L, ts(30), "view", 99.0))   // no profile slot -> NOT anomalous
      q.processAllAvailable()
      // push the watermark past the first minute so its windows finalize
      mem.addData((4L, ts(400), "click", 10.0))
      q.processAllAvailable()
      val out = spark.table("anom_t")
        .filter(col("window_start") === ts(0)).collect()
      val click = out.find(_.getString(1) == "click").get
      assert(click.getLong(2) == 2 && click.getLong(3) == 1,
        s"click window: ${click.mkString(",")}")
      val view = out.find(_.getString(1) == "view").get
      assert(view.getLong(3) == 0, "unprofiled slot must not flag")
    } finally q.stop()
  }

  test("the streaming profile is the batch fit: one definition of anomalous") {
    val p = graft.scale.FeatureOps.seasonalProfile(spark, sfDir)
    assert(p.columns.toSeq == Seq("event_type", "hod", "n_ref", "mu", "sigma"))
    assert(p.count() > 0)
  }

  test("streaming the real current window reproduces the batch census slot-for-slot") {
    // BATCH-EQUIVALENCE: feed every current-window event of the real
    // events table through the streaming scorer (MemoryStream → memory
    // sink), re-aggregate the per-minute windows to (event_type, hod) —
    // minute windows nest exactly inside hours — and diff against the
    // batch query the driver oracles (anomaly_seasonal). Zero rows may
    // differ: one definition of anomalous, checked, not asserted.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val splitUs = 1705363200000000L // FeatureOps' reference/current split
    val cur = graft.Tables.events(spark, sfDir)
      .filter(unix_micros(col("ts")) >= lit(splitUs))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    assert(cur.length > 100, "fixture must exercise the stream meaningfully")
    val profile = graft.scale.FeatureOps.seasonalProfile(spark, sfDir)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = AnomalyStream.score(
        mem.toDF().toDF("event_id", "ts", "event_type", "value"), profile)
      .writeStream.format("memory").queryName("anom_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(cur.toSeq: _*)
      q.processAllAvailable()
      // two flush sentinels: the first advances the watermark past every
      // real window, the second forces a batch in which they emit
      val maxTs = cur.map(_._2.getTime).max
      mem.addData((-1L, new java.sql.Timestamp(maxTs + 10 * 60 * 1000), "zz_flush", 0.0))
      q.processAllAvailable()
      mem.addData((-2L, new java.sql.Timestamp(maxTs + 20 * 60 * 1000), "zz_flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("anom_equiv")
        .groupBy(col("event_type"), hour(col("window_start")).as("hod"))
        .agg(sum(col("n_events")).as("sn_cur"),
          sum(col("n_anomalies")).as("sn_anomalies"))
      val batch = graft.scale.FeatureOps.anomalySeasonal(spark, sfDir)
        .select(col("event_type"), col("hod"), col("n_cur"), col("n_anomalies"))
      val joined = batch.join(streamed, Seq("event_type", "hod"))
      assert(joined.count() == batch.count(),
        "every batch slot must appear in the streamed census")
      val diff = joined.filter(
        col("n_cur") =!= col("sn_cur") || col("n_anomalies") =!= col("sn_anomalies"))
      assert(diff.count() == 0, diff.collect().mkString("; "))
    } finally q.stop()
  }
}
