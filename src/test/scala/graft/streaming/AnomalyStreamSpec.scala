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
}
