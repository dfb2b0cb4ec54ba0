package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the w41 state machines — properties the
  * value-equality oracle cannot express directly. */
class ZigzagRenkoSpec extends SparkSpec {

  test("zigzag pivots alternate high/low per user and swings point the right way") {
    val rows = ZigzagRenko.w41Zigzag(spark, sfDir)
      .orderBy(col("user_id"), col("bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getString(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, ps) =>
      // strict alternation: a confirmed high is only ever followed by a
      // low and vice versa (the provisional final pivot obeys it too —
      // it carries the still-open leg's direction)
      ps.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a != b, s"user $uid: consecutive '$a' pivots")
        case _ =>
      }
      // swing sign: a high pivot closes an UP leg (positive swing from
      // the previous low), a low pivot a DOWN leg — except from a zero
      // previous pivot, where the swing is null by the 0-guard
      ps.drop(1).foreach { case (_, tp, swing) =>
        swing.foreach { s =>
          if (tp == "high") assert(s > 0, s"user $uid: high pivot with swing $s")
          else assert(s < 0, s"user $uid: low pivot with swing $s")
        }
      }
    }
  }

  test("supertrend rides exactly one band and flips only when close breaks it") {
    val rows = ZigzagRenko.w42Supertrend(spark, sfDir)
      .filter(col("supertrend").isNotNull)
      .orderBy(col("user_id"), col("bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (uid, st, fu, fl, bull) =>
      // the active line IS one of the two bands, chosen by the side flag
      assert(st == (if (bull) fl else fu), s"user $uid: st $st not the ${if (bull) "lower" else "upper"} band")
      assert(fl <= fu, s"user $uid: bands crossed ($fl > $fu)")
    }
    // both regimes occur on the fixture
    assert(rows.exists(_._5) && rows.exists(!_._5), "fixture should see both trend sides")
  }

  test("renko bricks chain on the anchor lattice with consecutive numbering") {
    val rows = ZigzagRenko.w41Renko(spark, sfDir)
      .orderBy(col("user_id"), col("brick_no"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, bs) =>
      // numbering 1..n with no gaps
      assert(bs.map(_._2).toSeq == (1L to bs.length).toSeq, s"user $uid: brick_no gaps")
      // every brick spans exactly one brick size in its direction, and
      // each brick opens where the previous one closed (reversals
      // included — 1-brick reversal keeps the lattice contiguous)
      val size = math.abs(bs.head._4 - bs.head._3)
      assert(size > 0)
      bs.foreach { case (_, _, o, c, d) =>
        assert(math.abs(math.abs(c - o) - size) < 1e-4, s"user $uid: brick span ${c - o} vs $size")
        assert(if (d == "up") c > o else c < o, s"user $uid: direction $d with open $o close $c")
      }
      bs.sliding(2).foreach {
        case Array((_, _, _, c1, _), (_, _, o2, _, _)) =>
          assert(math.abs(c1 - o2) < 1e-4, s"user $uid: brick chain broken ($c1 -> $o2)")
        case _ =>
      }
    }
  }
}
