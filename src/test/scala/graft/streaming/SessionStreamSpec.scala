package graft.streaming

import graft.SparkSpec
import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream parity for sessionization: the SAME
  * [[Sessions.sessionAggregate]] plan, run once over a static frame and
  * once as a watermarked streaming query, must emit identical sessions.
  * This is the claim the batch query's doc comment makes — pinned here.
  */
class SessionStreamSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("streaming session_window emits exactly the batch sessions once the watermark closes them") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "5 seconds")
    val q = Sessions.sessionAggregate(stream, "30 seconds")
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode(OutputMode.Append()).start()
    // 3 users × 2 sessions each: bursts at t=0..20 and t=120..140 (gap 100 s > 30 s)
    val data = for {
      u <- 0L until 3L
      burst <- Seq(0L, 120L)
      i <- 0L until 5L
    } yield (u, ts(burst + i * 5 + u), (u * 10 + i).toDouble)
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // sentinel batches: first raises the max event time, the next lets
      // the state store evict sessions older than the advanced watermark
      mem.addData((99L, ts(100000), 0.0)); q.processAllAvailable()
      mem.addData((99L, ts(200000), 0.0)); q.processAllAvailable()
      val streamed = spark.table("sessions_t")
        .filter(col("user_id") < 99)
        .orderBy("user_id", "session_start").collect()
      val batch = Sessions.sessionAggregate(
        data.toDF("user_id", "ts", "value"), "30 seconds")
        .orderBy("user_id", "session_start").collect()
      assert(batch.length == 6, s"expected 3 users × 2 sessions, got ${batch.length}")
      assert(streamed.length == batch.length,
        s"streaming emitted ${streamed.length} of ${batch.length} closed sessions")
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getLong(0) == b.getLong(0))
        assert(s.getTimestamp(1) == b.getTimestamp(1) && s.getTimestamp(2) == b.getTimestamp(2))
        assert(s.getLong(3) == b.getLong(3))            // n_events
        assert(s.getDouble(4) == b.getDouble(4))        // sum_value (rounded both sides)
        assert(s.getLong(5) == b.getLong(5))            // duration_us
      }
    } finally q.stop()
  }
}
