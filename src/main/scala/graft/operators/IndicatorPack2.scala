package graft.operators

import graft.Tables
import graft.features.Indicators._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Indicator pack 2 — beyond-reference oscillators a FOREX analytics
  * user would reach for next (the reference's own suite stops at W43):
  * Money Flow Index, Chaikin Money Flow, TRIX, and the Vortex pair.
  * Same execution contract as the rest of §2.7: every indicator is a
  * pure `Column` over the per-symbol ordered window, so each query is
  * ONE exchange on user_id + one sort regardless of how many
  * indicators stack, and the whole select stays in whole-stage
  * codegen. Warmup parity via [[graft.features.Indicators.framed]]
  * count-gating; `/0 → NULL` via safeDiv, mirrored `nullif` in SQL.
  */
object IndicatorPack2 {

  private val w = W()

  // ---------------------------------------------------------------- W44
  /** W44 — MFI-14 + CMF-20 (volume-weighted flow oscillators).
    *
    * MFI: typical price tp=(h+l+c)/3; raw flow tp·volume splits into
    * positive/negative legs on the tp direction (flat ticks feed
    * neither leg); MFI = 100·pos/(pos+neg) over 14 — algebraically the
    * textbook 100−100/(1+ratio) without the 0-denominator pole.
    *
    * CMF: multiplier ((c−l)−(h−c))/(h−l) — 0 on a degenerate h=l
    * candle (the convention that keeps the rolling sum total; a NULL
    * there would blank every 20-row window crossing it) — times
    * volume, summed 20, over summed volume. */
  def w44MoneyFlow(spark: SparkSession, dir: String): DataFrame = {
    val tp = (col("high") + col("low") + col("close")) / 3.0
    val base = Tables.candles(spark, dir)
      .withColumn("tp", tp)
      .withColumn("ptp", lag(col("tp"), 1).over(w))
      .withColumn("pos", when(col("ptp").isNotNull,
        when(col("tp") > col("ptp"), col("tp") * col("volume")).otherwise(0.0)))
      .withColumn("neg", when(col("ptp").isNotNull,
        when(col("tp") < col("ptp"), col("tp") * col("volume")).otherwise(0.0)))
      .withColumn("mfv", when(col("high") =!= col("low"),
        (col("close") - col("low") - (col("high") - col("close"))) /
          (col("high") - col("low")) * col("volume")).otherwise(lit(0.0)))
    val posS = rollSum(col("pos"), 14, w)
    val negS = rollSum(col("neg"), 14, w)
    base.select(
      col("user_id"), col("bucket"),
      round(lit(100.0) * safeDiv(posS, posS + negS), 6).as("mfi_14"),
      round(safeDiv(rollSum(col("mfv"), 20, w), rollSum(col("volume"), 20, w)), 6)
        .as("cmf_20"))
  }

  val w44Sql: String = Tables.candlesSql +
    """, t1 AS (
      |  SELECT user_id, bucket, high, low, close, volume,
      |         (high + low + close) / 3.0 AS tp,
      |         lag((high + low + close) / 3.0)
      |           OVER (PARTITION BY user_id ORDER BY bucket) AS ptp
      |  FROM candles),
      |t2 AS (
      |  SELECT user_id, bucket, volume,
      |    CASE WHEN ptp IS NOT NULL THEN
      |      CASE WHEN tp > ptp THEN tp * volume ELSE 0.0 END END AS pos,
      |    CASE WHEN ptp IS NOT NULL THEN
      |      CASE WHEN tp < ptp THEN tp * volume ELSE 0.0 END END AS neg,
      |    CASE WHEN high <> low THEN
      |      (close - low - (high - close)) / (high - low) * volume
      |      ELSE 0.0 END AS mfv
      |  FROM t1)
      |SELECT user_id, bucket,
      |  round(100.0 *
      |    (CASE WHEN count(pos) OVER w14 = 14 THEN sum(pos) OVER w14 END) /
      |    nullif((CASE WHEN count(pos) OVER w14 = 14 THEN sum(pos) OVER w14 END) +
      |           (CASE WHEN count(neg) OVER w14 = 14 THEN sum(neg) OVER w14 END), 0),
      |    6) + 0 AS mfi_14,
      |  round((CASE WHEN count(mfv) OVER w20 = 20 THEN sum(mfv) OVER w20 END) /
      |    nullif(CASE WHEN count(volume) OVER w20 = 20 THEN sum(volume) OVER w20 END, 0),
      |    6) + 0 AS cmf_20
      |FROM t2
      |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |       w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
      |       w20 AS (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- W45
  /** W45 — TRIX-15 + Vortex-14.
    *
    * TRIX: 1-bar pct change (×100) of a triple-smoothed EMA — three
    * stacked [[graft.functions.EwmAvg]] windows over the SAME
    * partition/order, so Catalyst reuses one sort for all three; the
    * oracle nests the normalized-weight identity three layers deep
    * (the MACD oracle's pattern, one layer deeper).
    *
    * Vortex: VI± = Σ|h−l₋₁| resp. Σ|l−h₋₁| over Σ true-range, 14. */
  def w45TrixVortex(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val grow = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    def ewm(c: org.apache.spark.sql.Column) = GraftFunctions.ewmAvgSpan(c, 15).over(grow)
    val pc = lag(col("close"), 1).over(w)
    val pl = lag(col("low"), 1).over(w)
    val ph = lag(col("high"), 1).over(w)
    val base = Tables.candles(spark, dir)
      .withColumn("e1", ewm(col("close")))
      .withColumn("e2", ewm(col("e1")))
      .withColumn("e3", ewm(col("e2")))
      .withColumn("pe3", lag(col("e3"), 1).over(w))
      .withColumn("tr", when(pc.isNotNull, greatest(col("high"), pc) - least(col("low"), pc)))
      .withColumn("vmp", when(pl.isNotNull, abs(col("high") - pl)))
      .withColumn("vmm", when(ph.isNotNull, abs(col("low") - ph)))
    base.select(
      col("user_id"), col("bucket"),
      round(lit(100.0) * safeDiv(col("e3") - col("pe3"), col("pe3")), 6).as("trix_15"),
      round(safeDiv(rollSum(col("vmp"), 14, w), rollSum(col("tr"), 14, w)), 6).as("vi_plus"),
      round(safeDiv(rollSum(col("vmm"), 14, w), rollSum(col("tr"), 14, w)), 6).as("vi_minus"))
  }

  // Oracle-side EWM identity bound (shared W4-family idiom): the
  // unnormalized weight pow(1/(1-α), n) overflows double to Inf near
  // n ≈ ln(1.8e308)/ln(1/(1-α)) — ~5300 rows/key at α = 0.125, ~8800 at
  // α = 2/14 — turning the ORACLE's e1/e2/e3 into NaN while the Spark
  // side (incremental fold) stays finite. Safe on the fixtures because
  // GenScale replicates KEYS rather than lengthening series; a fixture
  // with longer per-key series must switch the oracle to a windowed
  // renormalization before this bound.
  private val alpha15 = "(2.0 / 16.0)"

  val w45Sql: String = Tables.candlesSql +
    s""", u1 AS (
       |  SELECT user_id, bucket, high, low, close,
       |    pow(1.0 / (1.0 - $alpha15), CAST(count(close) OVER wg AS DOUBLE)) AS uw
       |  FROM candles
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |l1 AS (
       |  SELECT user_id, bucket, high, low, close, uw,
       |    sum(close * uw) OVER wg / sum(uw) OVER wg AS e1
       |  FROM u1
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |l2 AS (
       |  SELECT user_id, bucket, high, low, close, uw,
       |    sum(e1 * uw) OVER wg / sum(uw) OVER wg AS e2
       |  FROM l1
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |l3 AS (
       |  SELECT user_id, bucket, high, low, close,
       |    sum(e2 * uw) OVER wg / sum(uw) OVER wg AS e3
       |  FROM l2
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |         wg AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |v AS (
       |  SELECT user_id, bucket, e3,
       |    lag(e3) OVER w AS pe3,
       |    CASE WHEN lag(close) OVER w IS NOT NULL THEN
       |      greatest(high, lag(close) OVER w) - least(low, lag(close) OVER w) END AS tr,
       |    CASE WHEN lag(low) OVER w IS NOT NULL THEN
       |      abs(high - lag(low) OVER w) END AS vmp,
       |    CASE WHEN lag(high) OVER w IS NOT NULL THEN
       |      abs(low - lag(high) OVER w) END AS vmm
       |  FROM l3
       |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket))
       |SELECT user_id, bucket,
       |  round(100.0 * (e3 - pe3) / nullif(pe3, 0), 6) + 0 AS trix_15,
       |  round((CASE WHEN count(vmp) OVER w14 = 14 THEN sum(vmp) OVER w14 END) /
       |    nullif(CASE WHEN count(tr) OVER w14 = 14 THEN sum(tr) OVER w14 END, 0), 6) + 0
       |    AS vi_plus,
       |  round((CASE WHEN count(vmm) OVER w14 = 14 THEN sum(vmm) OVER w14 END) /
       |    nullif(CASE WHEN count(tr) OVER w14 = 14 THEN sum(tr) OVER w14 END, 0), 6) + 0
       |    AS vi_minus
       |FROM v
       |WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
       |       w14 AS (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w44_money_flow"  -> (w44MoneyFlow _),
    "w45_trix_vortex" -> (w45TrixVortex _))

  def oracles: Map[String, String] = Map(
    "w44_money_flow"  -> w44Sql,
    "w45_trix_vortex" -> w45Sql)
}
