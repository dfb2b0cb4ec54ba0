package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Segmented single-key windows — the SURVEY §7.5 scale mitigation.
  *
  * A FOREX deployment has ONE symbol (`EURUSD`), so
  * `Window.partitionBy(symbol)` degenerates to a single partition and the
  * whole indicator suite serializes onto one core no matter how many
  * executors exist. For bounded ROWS frames (every SMA/stddev/lag/min/max
  * indicator) the fix is horizontal: range-split the time axis into N
  * segments, replicate each segment's trailing `lookback` rows into the
  * next segment (the overlap a frame can reach), window inside
  * `partitionBy(segment)` — N-way parallel — and drop the replica rows.
  * Results are bit-identical to the unsegmented window for any frame of
  * length ≤ lookback+1 (the replicas supply exactly the history the frame
  * needs across the cut).
  *
  * Precondition: every segment holds ≥ lookback rows (dense series +
  * N ≪ rows/lookback — at 100 TB the segment count is executor-core
  * sized, thousands of rows per segment, so this holds by construction).
  *
  * Segment assignment is fit-then-apply: one tiny min/max aggregate
  * broadcast back over the data (never a global sort or single-partition
  * row_number). The carry replication costs N·lookback extra rows —
  * negligible against the serial alternative.
  */
object Segmented {

  /** Apply `features` (built on the supplied per-segment WindowSpec) to
    * `df` with `nSegments`-way parallelism over the `orderCols`-sorted
    * series. `lookback` = max frame reach in rows (frame length − 1). */
  def segmented(df: DataFrame, orderTs: String, tieBreak: String,
                lookback: Int, nSegments: Int)(
                features: (DataFrame, WindowSpec) => DataFrame): DataFrame = {
    val bounds = df.agg(
      unix_micros(min(col(orderTs))).as("__tmin"),
      (unix_micros(max(col(orderTs))) - unix_micros(min(col(orderTs))) + 1).as("__span"))
    val base = df.crossJoin(broadcast(bounds))
      .withColumn("__seg", least(
        floor((unix_micros(col(orderTs)) - col("__tmin")) * nSegments / col("__span")),
        lit(nSegments - 1)).cast("int"))
      .drop("__tmin", "__span")
    val wTail = Window.partitionBy(col("__seg"))
      .orderBy(col(orderTs).desc, col(tieBreak).desc)
    val carries = base
      .withColumn("__rnd", row_number().over(wTail))
      .filter(col("__rnd") <= lookback && col("__seg") < nSegments - 1)
      .withColumn("__seg", col("__seg") + 1)
      .withColumn("__carry", lit(true))
      .drop("__rnd")
    val unioned = base.withColumn("__carry", lit(false)).unionByName(carries)
    val w = Window.partitionBy(col("__seg"))
      .orderBy(col(orderTs), col(tieBreak))
    features(unioned, w)
      .filter(!col("__carry"))
      .drop("__seg", "__carry")
  }

  /** W3 over the WHOLE events table as one series (the single-symbol
    * deployment: no partition key at all), 8-way parallel: SMA-20 +
    * rolling max via segmented windows. The oracle computes the naive
    * single-partition window — the segmented plan must hash-match it
    * exactly, which is the whole point. */
  def w3SmaSegmented(spark: SparkSession, dir: String): DataFrame = {
    val series = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("value"))
    segmented(series, "ts", "event_id", lookback = 19, nSegments = 8) { (d, w) =>
      val w20 = w.rowsBetween(-19, 0)
      d.withColumn("sma_20",
          when(count(col("value")).over(w20) === 20,
            round(avg(col("value")).over(w20), 6)))
        .withColumn("max_20",
          when(count(col("value")).over(w20) === 20,
            round(max(col("value")).over(w20), 6)))
    }.select(col("event_id"), col("sma_20"), col("max_20"))
  }

  val w3SmaSegmentedSql: String =
    """SELECT event_id,
      |  round(CASE WHEN count(value) OVER w20 = 20 THEN avg(value) OVER w20 END, 6) AS sma_20,
      |  round(CASE WHEN count(value) OVER w20 = 20 THEN max(value) OVER w20 END, 6) AS max_20
      |FROM events
      |WINDOW w20 AS (ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w3_sma_segmented" -> (w3SmaSegmented _))

  def oracles: Map[String, String] = Map(
    "w3_sma_segmented" -> w3SmaSegmentedSql)
}
