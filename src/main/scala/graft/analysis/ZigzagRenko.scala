package graft.analysis

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One confirmed (or final provisional) ZigZag pivot. */
case class ZigzagRow(user_id: Long, bucket: java.sql.Timestamp,
    price: Double, pivot_type: String, swing_pct: Option[Double])

/** Renko fold input: candle close + the user's fitted brick size. */
case class RenkoInRow(user_id: Long, bucket: java.sql.Timestamp,
    close: Double, brick: Double)

/** One Renko brick (bucket = the candle whose close produced it). */
case class RenkoRow(user_id: Long, bucket: java.sql.Timestamp,
    brick_no: Long, brick_open: Double, brick_close: Double, direction: String)

/** SuperTrend fold input: candle close + midpoint + warmup-guarded ATR. */
case class StIn(user_id: Long, bucket: java.sql.Timestamp,
    close: Double, hl2: Double, atr: Option[Double])

/** One SuperTrend row (nulls during the ATR warmup). */
case class StRow(user_id: Long, bucket: java.sql.Timestamp,
    supertrend: Option[Double], final_ub: Option[Double],
    final_lb: Option[Double], is_bull: Option[Boolean])

/** W41 — ZigZag pivots and Renko bricks (r5 verdict item 7: the last
  * common TA family beyond the reference's 50+ indicator set). Both are
  * inherently sequential state machines like W19/W39, so they ride the
  * same `groupByKey(user).flatMapSortedGroups(bucket)` streaming fold —
  * O(1) state per key, parallelism = number of keys — and both are
  * oracled as lockstep recursive CTEs carrying the identical state
  * tuple through the identical arithmetic (bit-exact doubles, not
  * approximately equal).
  *
  * ZigZag (close-based, 10% reversal): track the running extreme in the
  * current direction; when price retraces ≥10% from it, the extreme is
  * confirmed as a pivot and direction flips. The series end emits the
  * live extreme as a provisional pivot (charting convention).
  *
  * Renko (simple 1-brick reversal): brick size = 1/16 of the user's
  * full price range (a fit-then-fold two-pass, like the normalizer);
  * each close emits floor(|close − anchor| / brick) bricks in its
  * direction and advances the anchor by exactly that many bricks, so
  * brick boundaries live on the anchor lattice, never on raw prices. */
object ZigzagRenko {

  private[graft] val Thr = 0.1 // ZigZag reversal fraction

  private def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  // ---------------------------------------------------------------- zigzag
  /** ZigZag state: direction (0 = anchor phase), running extreme
    * (value + bucket millis), previous confirmed pivot. Shared verbatim
    * by the batch fold and [[graft.streaming.Channels.zigzagStream]] so
    * the two cannot drift — the equivalence spec then only has to check
    * the plumbing, not the arithmetic. */
  private[graft] final case class ZzCore(d: Int, extV: Double, extBMs: Long,
      prevPiv: Double, hasPrev: Boolean)

  private[graft] def zzInit(close: Double, bMs: Long): ZzCore =
    ZzCore(0, close, bMs, 0.0, hasPrev = false)

  /** One pivot emission: (bucket ms, rounded price, type, swing). */
  private[graft] type ZzPivot = (Long, Double, String, Option[Double])

  private def pivotOf(st: ZzCore, tp: String): ZzPivot = {
    val swing = if (st.hasPrev && st.prevPiv != 0.0)
      Some(r6d((st.extV - st.prevPiv) / st.prevPiv)) else None
    (st.extBMs, r6d(st.extV), tp, swing)
  }

  /** One transition of the ZigZag machine for `close` at `bMs`. */
  private[graft] def zzStep(st: ZzCore, close: Double, bMs: Long):
      (ZzCore, Option[ZzPivot]) = {
    def confirm(tp: String, nd: Int): (ZzCore, Option[ZzPivot]) =
      (ZzCore(nd, close, bMs, st.extV, hasPrev = true), Some(pivotOf(st, tp)))
    if (st.d == 0) {
      // anchor phase: the first close is a FIXED anchor; the first ±10%
      // move both sets the direction and confirms the anchor as the
      // opposite-type pivot
      if (close >= st.extV * (1 + Thr)) confirm("low", 1)
      else if (close <= st.extV * (1 - Thr)) confirm("high", -1)
      else (st, None)
    } else if (st.d == 1) {
      if (close > st.extV) (st.copy(extV = close, extBMs = bMs), None)
      else if (close <= st.extV * (1 - Thr)) confirm("high", -1)
      else (st, None)
    } else {
      if (close < st.extV) (st.copy(extV = close, extBMs = bMs), None)
      else if (close >= st.extV * (1 + Thr)) confirm("low", 1)
      else (st, None)
    }
  }

  /** Series-end provisional pivot (charting convention; the streaming
    * channel cannot emit it — append mode admits no retraction). */
  private[graft] def zzFinish(st: ZzCore): Option[ZzPivot] =
    if (st.d == 0) None
    else Some(pivotOf(st, if (st.d == 1) "high" else "low"))

  def w41Zigzag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Stateful.candleDs(spark, dir)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[CandleRow]) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val first = rows.next()
          var core = zzInit(first.close, first.bucket.getTime)
          val buf = scala.collection.mutable.ArrayBuffer.empty[ZigzagRow]
          def add(p: ZzPivot): Unit = p match {
            case (ms, v, tp, sw) =>
              buf += ZigzagRow(uid, new java.sql.Timestamp(ms), v, tp, sw)
          }
          rows.foreach { r =>
            val (nc, piv) = zzStep(core, r.close, r.bucket.getTime)
            core = nc
            piv.foreach(add)
          }
          zzFinish(core).foreach(add)
          buf.iterator
        }
      }
      .toDF()
  }

  /** ZigZag oracle: state (d, ext, prev_pivot) advanced in lockstep,
    * emission columns NULL on non-pivot steps; the provisional final
    * pivot comes from each user's terminal state row. Every confirm
    * condition carries the close-vs-extreme conjunct (`close <= ext_v`
    * for d=1, `>=` for d=-1) mirroring the Scala machine's branch
    * ORDER — without it the branches only coincide for ext_v > 0, and
    * a non-positive price would make the oracle emit a pivot where
    * [[zzStep]] records a new extreme. */
  private val recursiveCandles: String =
    "WITH RECURSIVE " + Tables.candlesSql.stripPrefix("WITH ")

  val w41ZigzagSql: String =
    s"""$recursiveCandles,
       |zc AS (SELECT user_id, bucket, close,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn
       |       FROM candles),
       |zn AS (SELECT user_id, max(rn) AS mr FROM zc GROUP BY user_id),
       |zp(user_id, rn, d, ext_v, ext_b, prev_piv, piv_b, piv_v, piv_t, piv_prev) AS (
       |  SELECT user_id, rn, 0, close, bucket, NULL::DOUBLE,
       |         NULL::TIMESTAMP, NULL::DOUBLE, NULL::VARCHAR, NULL::DOUBLE
       |  FROM zc WHERE rn = 1
       |  UNION ALL
       |  SELECT c.user_id, c.rn,
       |    CASE WHEN p.d = 0 THEN
       |           CASE WHEN c.close >= p.ext_v * (1 + $Thr) THEN 1
       |                WHEN c.close <= p.ext_v * (1 - $Thr) THEN -1 ELSE 0 END
       |         WHEN p.d = 1 THEN
       |           CASE WHEN c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v THEN -1 ELSE 1 END
       |         ELSE
       |           CASE WHEN c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v THEN 1 ELSE -1 END
       |    END AS nd,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN c.close
       |         WHEN p.d = 1 AND c.close > p.ext_v THEN c.close
       |         WHEN p.d = -1 AND c.close < p.ext_v THEN c.close
       |         ELSE p.ext_v END,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN c.bucket
       |         WHEN p.d = 1 AND c.close > p.ext_v THEN c.bucket
       |         WHEN p.d = -1 AND c.close < p.ext_v THEN c.bucket
       |         ELSE p.ext_b END,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN p.ext_v ELSE p.prev_piv END,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN p.ext_b END,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN p.ext_v END,
       |    CASE WHEN (p.d = 0 AND c.close >= p.ext_v * (1 + $Thr))
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v) THEN 'low'
       |         WHEN (p.d = 0 AND c.close <= p.ext_v * (1 - $Thr))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v) THEN 'high' END,
       |    CASE WHEN (p.d = 0 AND (c.close >= p.ext_v * (1 + $Thr) OR c.close <= p.ext_v * (1 - $Thr)))
       |           OR (p.d = 1 AND c.close <= p.ext_v * (1 - $Thr) AND c.close <= p.ext_v)
       |           OR (p.d = -1 AND c.close >= p.ext_v * (1 + $Thr) AND c.close >= p.ext_v)
       |         THEN p.prev_piv END
       |  FROM zp p JOIN zc c ON c.user_id = p.user_id AND c.rn = p.rn + 1
       |),
       |confirmed AS (
       |  SELECT user_id, piv_b AS bucket, piv_v AS price, piv_t AS pivot_type,
       |         piv_prev AS prev_piv
       |  FROM zp WHERE piv_t IS NOT NULL),
       |provisional AS (
       |  SELECT p.user_id, p.ext_b AS bucket, p.ext_v AS price,
       |         CASE WHEN p.d = 1 THEN 'high' ELSE 'low' END AS pivot_type,
       |         p.prev_piv
       |  FROM zp p JOIN zn n ON n.user_id = p.user_id AND p.rn = n.mr
       |  WHERE p.d <> 0),
       |pivots AS (SELECT * FROM confirmed UNION ALL SELECT * FROM provisional)
       |SELECT user_id, bucket, floor(price * 1e6 + 0.5) / 1e6 AS price, pivot_type,
       |       CASE WHEN prev_piv IS NOT NULL AND prev_piv <> 0
       |            THEN floor((price - prev_piv) / prev_piv * 1e6 + 0.5) / 1e6 END AS swing_pct
       |FROM pivots""".stripMargin

  // ---------------------------------------------------------------- renko
  /** Renko brick state: lattice anchor + running brick count. Shared
    * verbatim by the batch fold and
    * [[graft.streaming.Channels.renkoStream]] — same contract as
    * [[ZzCore]]/[[zzStep]], so the equivalence spec only checks
    * plumbing, never arithmetic. */
  private[graft] final case class RenkoCore(anchor: Double, no: Long)

  private[graft] def renkoInit(close: Double): RenkoCore = RenkoCore(close, 0L)

  /** One brick emission: (brick_no, open, close, direction). */
  private[graft] type RenkoBrick = (Long, Double, Double, String)

  /** One transition: emit floor(|close − anchor| / brick) bricks in the
    * move's direction and advance the anchor by exactly that many
    * bricks, so boundaries stay on the anchor lattice, never on raw
    * prices. Non-positive brick sizes fold to no-ops (degenerate fit:
    * a constant-price key). */
  private[graft] def renkoStep(st: RenkoCore, close: Double, brick: Double):
      (RenkoCore, Seq[RenkoBrick]) = {
    if (brick <= 0) (st, Nil)
    else {
      val up = if (close > st.anchor)
        math.floor((close - st.anchor) / brick).toLong else 0L
      val dn = if (close < st.anchor)
        math.floor((st.anchor - close) / brick).toLong else 0L
      if (up >= 1)
        (RenkoCore(st.anchor + up * brick, st.no + up),
          (1L to up).map(k => (st.no + k,
            r6d(st.anchor + (k - 1) * brick), r6d(st.anchor + k * brick), "up")))
      else if (dn >= 1)
        (RenkoCore(st.anchor - dn * brick, st.no + dn),
          (1L to dn).map(k => (st.no + k,
            r6d(st.anchor - (k - 1) * brick), r6d(st.anchor - k * brick), "down")))
      else (st, Nil)
    }
  }

  def w41Renko(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val candles = Tables.candles(spark, dir)
    // fit: per-user brick size from the full range — one hash aggregate,
    // broadcastable back onto the fold input (key-sized frame)
    val bricks = candles.groupBy(col("user_id"))
      .agg(((max(col("high")) - min(col("low"))) / 16).as("brick"))
    candles.join(broadcast(bricks), "user_id")
      .select(col("user_id"), col("bucket"), col("close"), col("brick"))
      .as[RenkoInRow]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[RenkoInRow]) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val first = rows.next()
          val b = first.brick
          var core = renkoInit(first.close)
          val buf = scala.collection.mutable.ArrayBuffer.empty[RenkoRow]
          rows.foreach { r =>
            val (nc, bricks) = renkoStep(core, r.close, b)
            core = nc
            bricks.foreach { case (no, o, c, dir) =>
              buf += RenkoRow(uid, r.bucket, no, o, c, dir)
            }
          }
          buf.iterator
        }
      }
      .toDF()
  }

  /** Renko oracle: anchor state in lockstep; each step records how many
    * bricks it emitted and its pre-step anchor, and the final select
    * expands them with generate_series on the same anchor lattice. */
  val w41RenkoSql: String =
    s"""$recursiveCandles,
       |rc AS (SELECT user_id, bucket, close,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn
       |       FROM candles),
       |rb AS (SELECT user_id, (max(high) - min(low)) / 16 AS brick
       |       FROM candles GROUP BY user_id),
       |rp(user_id, rn, bucket, brick, anchor, prev_anchor, n_up, n_dn, tot) AS (
       |  SELECT c.user_id, c.rn, c.bucket, b.brick, c.close, c.close,
       |         0::BIGINT, 0::BIGINT, 0::BIGINT
       |  FROM rc c JOIN rb b ON b.user_id = c.user_id WHERE c.rn = 1
       |  UNION ALL
       |  SELECT c.user_id, c.rn, c.bucket, p.brick,
       |    CASE WHEN p.brick > 0 AND c.close > p.anchor
       |           THEN p.anchor + CAST(floor((c.close - p.anchor) / p.brick) AS BIGINT) * p.brick
       |         WHEN p.brick > 0 AND c.close < p.anchor
       |           THEN p.anchor - CAST(floor((p.anchor - c.close) / p.brick) AS BIGINT) * p.brick
       |         ELSE p.anchor END,
       |    p.anchor,
       |    CASE WHEN p.brick > 0 AND c.close > p.anchor
       |         THEN CAST(floor((c.close - p.anchor) / p.brick) AS BIGINT) ELSE 0 END,
       |    CASE WHEN p.brick > 0 AND c.close < p.anchor
       |         THEN CAST(floor((p.anchor - c.close) / p.brick) AS BIGINT) ELSE 0 END,
       |    p.tot
       |      + CASE WHEN p.brick > 0 AND c.close > p.anchor
       |             THEN CAST(floor((c.close - p.anchor) / p.brick) AS BIGINT) ELSE 0 END
       |      + CASE WHEN p.brick > 0 AND c.close < p.anchor
       |             THEN CAST(floor((p.anchor - c.close) / p.brick) AS BIGINT) ELSE 0 END
       |  FROM rp p JOIN rc c ON c.user_id = p.user_id AND c.rn = p.rn + 1
       |)
       |SELECT p.user_id, p.bucket,
       |       p.tot - p.n_up - p.n_dn + g.k AS brick_no,
       |       floor((CASE WHEN p.n_up >= 1 THEN p.prev_anchor + (g.k - 1) * p.brick
       |                   ELSE p.prev_anchor - (g.k - 1) * p.brick END) * 1e6 + 0.5) / 1e6
       |         AS brick_open,
       |       floor((CASE WHEN p.n_up >= 1 THEN p.prev_anchor + g.k * p.brick
       |                   ELSE p.prev_anchor - g.k * p.brick END) * 1e6 + 0.5) / 1e6
       |         AS brick_close,
       |       CASE WHEN p.n_up >= 1 THEN 'up' ELSE 'down' END AS direction
       |FROM rp p, unnest(generate_series(1, p.n_up + p.n_dn)) AS g(k)""".stripMargin

  // ------------------------------------------------------------ supertrend
  /** W42 — SuperTrend(10, 3): ATR bands around the candle midpoint with
    * the classic ratcheting fold — the final upper band only ever
    * tightens downward while price stays below it (and vice versa for
    * the lower), and the active band flips when the close breaks
    * through it. The band recurrence is order-sensitive (like PSAR), so
    * it rides the same sorted-group fold; the ATR feed is the plain
    * 10-row SMA window with the engine-wide full-window warmup guard,
    * computed BEFORE grouping so the fold state is just
    * (fu, fl, side, prevClose). Warmup rows emit nulls. */
  /** SuperTrend fold state: final upper/lower bands, the "is under the
    * upper band" side, and the previous close the next ratchet tests.
    * Factored out (the zzStep/renkoStep pattern) so TransitionPropSpec
    * can drive the ratchet with adversarial band series. */
  private[graft] final case class StCore(fu: Double, fl: Double,
      isu: Boolean, prevClose: Double)

  private[graft] def stInit(close: Double, ub: Double, lb: Double): StCore =
    StCore(ub, lb, close <= ub, close)

  /** One band-ratchet transition: the final upper band only moves DOWN
    * to a tighter raw band unless the previous close broke above it
    * (then it resets to the raw band); mirror-image for the lower. The
    * side flips when the close crosses the POST-update active band —
    * identical to [[w42SupertrendSql]]'s repeated CASEs. */
  private[graft] def stStep(st: StCore, close: Double, ub: Double, lb: Double): StCore = {
    val nfu = if (ub < st.fu || st.prevClose > st.fu) ub else st.fu
    val nfl = if (lb > st.fl || st.prevClose < st.fl) lb else st.fl
    val isu = if (st.isu) close <= nfu else close < nfl
    StCore(nfu, nfl, isu, close)
  }

  def w42Supertrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wspec = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
    val w10 = wspec.rowsBetween(-9, 0)
    val pc = lag(col("close"), 1).over(wspec)
    val tr = when(pc.isNull, col("high") - col("low"))
      .otherwise(greatest(col("high") - col("low"),
        abs(col("high") - pc), abs(col("low") - pc)))
    Tables.candles(spark, dir)
      .withColumn("hl2", (col("high") + col("low")) / 2)
      .withColumn("tr", tr)
      .withColumn("atr",
        when(count(col("tr")).over(w10) === 10, avg(col("tr")).over(w10)))
      .select(col("user_id"), col("bucket"), col("close"), col("hl2"), col("atr"))
      .as[StIn]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"bucket") { (uid: Long, rows: Iterator[StIn]) =>
        var core: StCore = null
        rows.map { r =>
          r.atr match {
            case None => StRow(uid, r.bucket, None, None, None, None)
            case Some(a) =>
              val ub = r.hl2 + 3 * a
              val lb = r.hl2 - 3 * a
              core = if (core == null) stInit(r.close, ub, lb)
                     else stStep(core, r.close, ub, lb)
              StRow(uid, r.bucket, Some(r6d(if (core.isu) core.fu else core.fl)),
                Some(r6d(core.fu)), Some(r6d(core.fl)), Some(!core.isu))
          }
        }
      }
      .toDF()
  }

  /** W42 oracle: ATR windows + the band fold as a lockstep recursive
    * CTE (state = fu/fl/side/close; the repeated CASEs ARE the fu/fl
    * updates, so `isu` reads the post-update bands exactly like the
    * Scala fold). Warmup rows join back as nulls. */
  val w42SupertrendSql: String = {
    val fuNew = "CASE WHEN c.ub < p.fu OR p.close > p.fu THEN c.ub ELSE p.fu END"
    val flNew = "CASE WHEN c.lb > p.fl OR p.close < p.fl THEN c.lb ELSE p.fl END"
    s"""$recursiveCandles,
       |sca AS MATERIALIZED (
       |  SELECT user_id, bucket, close, high, low, (high + low) / 2 AS hl2,
       |         row_number() OVER sw42 AS rn, lag(close) OVER sw42 AS pc
       |  FROM candles WINDOW sw42 AS (PARTITION BY user_id ORDER BY bucket)),
       |scb AS MATERIALIZED (
       |  SELECT *, CASE WHEN pc IS NULL THEN high - low
       |                 ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
       |  FROM sca),
       |scc AS MATERIALIZED (
       |  SELECT user_id, bucket, close, hl2, rn,
       |         CASE WHEN count(tr) OVER sw42b = 10 THEN avg(tr) OVER sw42b END AS atr
       |  FROM scb
       |  WINDOW sw42b AS (PARTITION BY user_id ORDER BY bucket
       |                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
       |scd AS MATERIALIZED (
       |  SELECT *, hl2 + 3 * atr AS ub, hl2 - 3 * atr AS lb
       |  FROM scc WHERE atr IS NOT NULL),
       |sp(user_id, rn, fu, fl, isu, close) AS (
       |  SELECT user_id, rn, ub, lb, close <= ub, close FROM scd WHERE rn = 10
       |  UNION ALL
       |  SELECT c.user_id, c.rn, $fuNew, $flNew,
       |    CASE WHEN p.isu THEN c.close <= ($fuNew) ELSE c.close < ($flNew) END,
       |    c.close
       |  FROM sp p JOIN scd c ON c.user_id = p.user_id AND c.rn = p.rn + 1)
       |SELECT s.user_id, s.bucket,
       |  floor((CASE WHEN p.isu THEN p.fu ELSE p.fl END) * 1e6 + 0.5) / 1e6 AS supertrend,
       |  floor(p.fu * 1e6 + 0.5) / 1e6 AS final_ub,
       |  floor(p.fl * 1e6 + 0.5) / 1e6 AS final_lb,
       |  NOT p.isu AS is_bull
       |FROM scc s LEFT JOIN sp p ON p.user_id = s.user_id AND p.rn = s.rn""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w41_zigzag"     -> (w41Zigzag _),
    "w41_renko"      -> (w41Renko _),
    "w42_supertrend" -> (w42Supertrend _))

  def oracles: Map[String, String] = Map(
    "w41_zigzag"     -> w41ZigzagSql,
    "w41_renko"      -> w41RenkoSql,
    "w42_supertrend" -> w42SupertrendSql)
}
