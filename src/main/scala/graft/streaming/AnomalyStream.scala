package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming anomaly scoring — the fit-offline / score-online split of
  * [[graft.scale.FeatureOps.anomalySeasonal]]: the per-(event_type,
  * hour-of-day) μ/σ profile is fitted in batch over the reference
  * window ([[graft.scale.FeatureOps.seasonalProfile]] — the SAME
  * expression the batch detector uses, so backfill and alerting agree),
  * broadcast as the static side of a stream-static join, and each
  * arriving event is flagged if it falls outside μ ± 3σ for its slot.
  * Flags aggregate into per-minute anomaly-rate windows under an
  * event-time watermark (append mode: a window's rate is final once
  * the watermark passes its end).
  *
  * Scale shape: the profile is bounded (types × 24 hours) so the join
  * is a broadcast — no stream-side state beyond the windowed counts;
  * at 100 TB/day the same topology holds because the static side never
  * grows with traffic. Unmatched slots (a type/hour absent from the
  * reference window) score not-anomalous rather than dropping the
  * event: a LEFT join + coalesce, the alerting-safe default. */
object AnomalyStream {

  /** events: streaming (event_id long, ts timestamp, event_type string,
    * value double). profile: BATCH-fitted (event_type, hod, n_ref, mu,
    * sigma). Returns the per-(1-minute window, type) anomaly census. */
  def score(events: DataFrame, profile: DataFrame): DataFrame =
    events
      .withColumn("hod", hour(col("ts")))
      .join(broadcast(profile), Seq("event_type", "hod"), "left")
      .withColumn("is_anomaly",
        coalesce(abs(col("value") - col("mu")) > col("sigma") * 3, lit(false)))
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_anomalies"))
}
