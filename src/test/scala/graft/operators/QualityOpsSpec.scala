package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** W37 gap interpolation on synthetic fixtures with KNOWN gaps
  * (FIXTURES.md §B corruption variants): 1–5-hour gaps fill linearly,
  * longer gaps stay null, edges never fabricate data. */
class QualityOpsSpec extends SparkSpec {

  private def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")

  test("a 2-hour gap fills linearly; a 7-hour gap stays null; flags mark only inserted rows") {
    import spark.implicits._
    // hours 0,1, [2,3 missing], 4,5, [6..12 missing], 13,14
    val candles = Seq(
      (1L, t(0), 10.0, 5L), (1L, t(1), 11.0, 5L),
      (1L, t(4), 17.0, 5L), (1L, t(5), 18.0, 5L),
      (1L, t(13), 40.0, 5L), (1L, t(14), 41.0, 5L))
      .toDF("user_id", "bucket", "close", "volume")
    val filled = QualityOps.gapFill(candles).orderBy("bucket").collect()
    assert(filled.length == 15) // dense hourly grid 0..14

    val byHour = filled.map(r => r.getTimestamp(1).toLocalDateTime.getHour -> r).toMap
    // 2-hour gap (hours 2,3): linear 11 → 17 over 3 steps: 13, 15
    assert(byHour(2).getDouble(2) == 13.0 && byHour(2).getBoolean(4))
    assert(byHour(3).getDouble(2) == 15.0 && byHour(3).getBoolean(4))
    assert(byHour(2).getLong(3) == 0L) // filled volume is 0
    // 7-hour gap (hours 6..12): beyond the 5-hour limit — stays null
    (6 to 12).foreach { h =>
      assert(byHour(h).isNullAt(2), s"hour $h must stay null")
      assert(!byHour(h).getBoolean(4), s"hour $h must not be flagged")
    }
    // original rows are untouched and unflagged
    Seq(0, 1, 4, 5, 13, 14).foreach { h =>
      assert(!byHour(h).getBoolean(4))
      assert(byHour(h).getLong(3) == 5L)
    }
  }

  test("gap fill is per-user: one user's span never bleeds into another's") {
    import spark.implicits._
    val candles = Seq(
      (1L, t(0), 10.0, 1L), (1L, t(3), 13.0, 1L), // user 1: hours 0..3
      (2L, t(10), 50.0, 1L), (2L, t(12), 52.0, 1L)) // user 2: hours 10..12
      .toDF("user_id", "bucket", "close", "volume")
    val filled = QualityOps.gapFill(candles)
    assert(filled.filter(col("user_id") === 1).count() == 4)  // grid 0..3 only
    assert(filled.filter(col("user_id") === 2).count() == 3)  // grid 10..12 only
    val u2 = QualityOps.gapFill(candles).filter(col("user_id") === 2)
      .orderBy("bucket").collect()
    assert(u2(1).getDouble(2) == 51.0 && u2(1).getBoolean(4)) // hour 11 lerped
  }
}
