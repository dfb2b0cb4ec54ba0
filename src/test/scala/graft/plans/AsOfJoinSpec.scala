package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The custom as-of operator: value parity with the composed
  * union+window form, left-outer null semantics, tie handling, plan
  * shape (one exchange+sort per side, no window), and the left-filter
  * pushdown rule. */
class AsOfJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def mkDf(rows: Seq[Row], schema: String) =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  private lazy val quotes = mkDf(Seq(
    Row(1L, 10L, 1.0), Row(1L, 20L, 2.0), Row(1L, 30L, 3.0),
    Row(2L, 15L, 9.0),
    Row(3L, 50L, 7.0)),
    "k BIGINT, t BIGINT, px DOUBLE")

  private lazy val trades = mkDf(Seq(
    Row(1L, 5L), Row(1L, 10L), Row(1L, 25L), Row(1L, 99L),
    Row(2L, 14L), Row(2L, 16L),
    Row(4L, 40L)),
    "k BIGINT, t BIGINT")
      .select(col("k"), col("t"), lit("x").as("tag"))

  test("backward as-of: last quote at or before each trade; nulls before first") {
    val q = quotes.select(col("k").as("qk"), col("t").as("qt"), col("px"))
    val out = AsOfJoinOps.asof(trades, q, Seq("k"), Seq("qk"), "t", "qt")
      .select(col("k"), col("t"), col("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out === Set(
      (1L, 5L, null),   // before first quote -> null (left outer)
      (1L, 10L, 1.0),   // tie: qt == t matches
      (1L, 25L, 2.0),
      (1L, 99L, 3.0),   // far after last quote still matches last
      (2L, 14L, null),
      (2L, 16L, 9.0),
      (4L, 40L, null))) // key with no quotes at all
  }

  test("parity with the union+window composition on real data") {
    val viaExec = graft.operators.Joins.j8AsofExec(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"), col("bar_open"),
        col("staleness_us"))
    val viaWindow = graft.operators.Joins.j6AsofJoin(spark, sfDir)
      .filter(col("user_id") <= 100)
      .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"),
        round(col("bar_open"), 6).as("bar_open"), col("staleness_us"))
    assert(viaExec.count() === viaWindow.count())
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty)
  }

  test("plan: AsOfJoinExec fed by one sort+exchange per side, no window") {
    val df = graft.operators.Joins.j8AsofExec(spark, sfDir)
    // AQE wraps the physical tree; collect() doesn't descend into it
    val executed = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val p = executed.toString
    assert(!p.contains("Window"), "composed-window fallback leaked in:\n" + p.take(800))
    val asof = executed.collect { case e: AsOfJoinExec => e }
    assert(asof.size === 1, p.take(800))
    // EnsureRequirements gave each side its own sort (key, time) directly
    // above a hash exchange on the key — the sort-merge-join shape
    asof.head.children.foreach { child =>
      assert(child.isInstanceOf[org.apache.spark.sql.execution.SortExec],
        "child is not SortExec:\n" + child.toString.take(400))
      assert(child.toString.contains("Exchange hashpartitioning"),
        "no hash exchange under sort:\n" + child.toString.take(400))
    }
  }

  test("tolerance: a null-time quote never matches (no Long wrap-around)") {
    // k=5's only quote has t = NULL: it sorts first within the key and
    // becomes the buffered candidate; the tolerance check must reject it
    // rather than wrap lTime - Long.MinValue into a "fresh" match
    val q = mkDf(Seq(Row(5L, null, 4.5), Row(1L, 10L, 1.0)),
      "qk BIGINT, qt BIGINT, px DOUBLE")
    val t = mkDf(Seq(Row(5L, 40L), Row(1L, 12L)), "k BIGINT, t BIGINT")
    val out = AsOfJoinOps.asof(t, q, Seq("k"), Seq("qk"), "t", "qt",
        toleranceUs = Some(1000L))
      .select(col("k"), col("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(5L -> None, 1L -> Some(1.0)))
  }

  test("property: exec matches a reference as-of on random keyed series") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small domains force the hard cases: key collisions, time ties,
    // keys present on only one side, empty sides
    val gen = for {
      nL <- Gen.choose(0, 120)
      nR <- Gen.choose(0, 120)
      l <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 30L)))
      r <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 30L)))
    } yield (l, r)
    (0 until 8).foreach { i =>
      val (lRows, rRows) = gen(org.scalacheck.Gen.Parameters.default,
        Seed(42L + i)).get
      // right values keyed by (k, t, idx) so the expected match is the
      // max-time row; duplicate (k, t) rows are collapsed to one to keep
      // "which duplicate wins" out of the property (nondeterministic in
      // ANY as-of implementation)
      val rDistinct = rRows.distinct
      val left = mkDf(lRows.zipWithIndex.map { case ((k, t), ix) =>
        Row(k, t, ix.toLong) }, "k BIGINT, t BIGINT, lid BIGINT")
      val right = mkDf(rDistinct.map { case (k, t) =>
        Row(k, t, k * 1000 + t) }, "rk BIGINT, rt BIGINT, rv BIGINT")
      val out = AsOfJoinOps.asof(left, right, Seq("k"), Seq("rk"), "t", "rt")
        .select(col("lid"), col("rv"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val outTol = AsOfJoinOps.asof(left, right, Seq("k"), Seq("rk"), "t", "rt",
          toleranceUs = Some(5L))
        .select(col("lid"), col("rv"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // reference model computed in plain Scala
      val byKey = rDistinct.groupBy(_._1)
      lRows.zipWithIndex.foreach { case ((k, t), ix) =>
        val m = byKey.get(k).flatMap(ts => ts.filter(_._2 <= t).sortBy(_._2).lastOption)
        val expected = m.map { case (rk, rt) => rk * 1000 + rt }
        assert(out(ix.toLong) === expected,
          s"iter $i: left=($k,$t) expected $expected got ${out(ix.toLong)}")
        val expectedTol = m.filter { case (_, rt) => t - rt <= 5L }
          .map { case (rk, rt) => rk * 1000 + rt }
        assert(outTol(ix.toLong) === expectedTol,
          s"iter $i tol: left=($k,$t) expected $expectedTol got ${outTol(ix.toLong)}")
      }
      assert(out.size === lRows.size)
    }
  }

  test("rule: left-only predicate is pushed below the join to the scan") {
    val df = graft.operators.Joins.j8AsofExec(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    // after PushLeftFilterThroughAsOf the as-of node's LEFT subtree
    // carries the user_id filter; no Filter remains above the join
    val joinNode = opt.collect { case j: AsOfJoinPlan => j }
    assert(joinNode.nonEmpty, opt.toString.take(800))
    val leftHasFilter = joinNode.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("user_id") => f
    }.nonEmpty
    assert(leftHasFilter, "filter not pushed to left child:\n" + opt.toString.take(1200))
    val filterAboveJoin = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f
    }
    assert(filterAboveJoin.isEmpty, "residual filter above join:\n" + opt.toString.take(1200))
  }
}
