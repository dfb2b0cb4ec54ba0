package graft.analysis

import graft.SparkSpec

/** Cross-method consistency of the importance suite (the parts a SQL
  * oracle can't see: MLlib fits and the RFE driver loop). */
class ImportanceSpec extends SparkSpec {

  // sf0.001's ~8-candle users leave a feature with zero variance, and
  // ANSI-mode corr throws on the 0/0 — the suite needs the density the
  // driver's own correctness gate (sf0.01) provides
  override def sfDir: String = "/root/testdata/sf0.01"

  test("zero-variance feature yields NULL corr instead of an ANSI crash") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1.0, 5.0), (1.0, 7.0), (1.0, 9.0)).toDF("x", "y")
    val r = df.agg(Importance.corrSafe(col("x"), col("y")).as("c")).head()
    assert(r.isNullAt(0))
    // and a healthy pair matches the builtin corr
    val df2 = Seq((1.0, 5.0), (2.0, 7.0), (4.0, 9.5)).toDF("x", "y")
    val safe = df2.agg(Importance.corrSafe(col("x"), col("y"))).head().getDouble(0)
    val builtin = df2.agg(corr(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(safe - builtin) < 1e-12)
  }

  test("F-stat ranking is monotone in |corr| (same order, different scale)") {
    val byCorr = Importance.corrImportance(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    val byF = Importance.fstatImportance(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(byCorr == byF, s"$byCorr vs $byF")
  }

  test("RFE emits a permutation of the features with ranks 1..n") {
    val rows = Importance.rfeImportance(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("ret_1", "vol_5", "mom_5", "rng_ratio", "body_ratio"))
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("permutation importance: shared baseline, consistent ranks, identity-shift sanity") {
    val rows = Importance.permImportance(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("ret_1", "vol_5", "mom_5", "rng_ratio", "body_ratio"))
    // one fixed scorer => every row carries the same baseline R^2
    assert(rows.map(_.getDouble(1)).distinct.length == 1)
    val base = rows.head.getDouble(1)
    assert(base > 0 && base <= 1)
    rows.foreach { r =>
      // importance = r2_base - r2_permuted (each rounded at 6)
      assert(math.abs(r.getDouble(3) - (base - r.getDouble(2))) < 2e-6, r.toString)
    }
    // ranks are a permutation ordered by importance desc
    val byRank = rows.sortBy(_.getInt(4))
    assert(byRank.map(_.getInt(4)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(byRank.map(_.getDouble(3)).toSeq.reverse.sorted.reverse ==
      byRank.map(_.getDouble(3)).toSeq)
  }

  test("pdp curves are linear in the grid with the fitted slope") {
    val rows = Importance.pdpImportance(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.groupBy(_.getString(0)).foreach { case (feat, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5), feat)
      // grid values are nondecreasing quantiles
      val gs = sorted.map(_.getDouble(2))
      assert(gs.zip(gs.tail).forall { case (a, b) => a <= b }, feat)
      // the curve is linear: pdp differences track beta * grid differences
      val beta = sorted.head.getDouble(3)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val dg = b.getDouble(2) - a.getDouble(2)
        val dp = b.getDouble(4) - a.getDouble(4)
        assert(math.abs(dp - beta * dg) < 1e-4, s"$feat: dp=$dp beta*dg=${beta * dg}")
      }
    }
  }

  test("consensus rank averages the corr and MI ranks") {
    val rows = Importance.consensusImportance(spark, sfDir).collect()
    rows.foreach { r =>
      val expected = (r.getInt(1) + r.getInt(2)) / 2.0
      assert(math.abs(r.getDouble(3) - expected) <= 0.05, r.toString)
    }
    assert(rows.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }
}
