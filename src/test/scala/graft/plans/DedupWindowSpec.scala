package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

/** [[DedupWindowExpressions]] — the r15 rule that collapses duplicate
  * window aggregates inside one Window operator. Pins (1) the plan
  * shape: no duplicate canonicalized window expressions survive
  * optimization, on both a synthetic frame and the real w24 indicator
  * query; (2) bit-identical results vs. the rule excluded; (3) the
  * nondeterminism guard: two rand() windows stay two draws. */
class DedupWindowSpec extends SparkSpec {

  private def windowExprCounts(plan: LogicalPlan): Seq[(Int, Int)] =
    plan.collect { case w: Window =>
      val aliases = w.windowExpressions.collect { case a: Alias => a.child.canonicalized }
      (w.windowExpressions.size, aliases.distinct.size)
    }

  private def syntheticDf = {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5, i, i.toDouble * 1.5)).toDF("k", "seq", "x")
    val w10 = W.partitionBy($"k").orderBy($"seq").rowsBetween(-9, 0)
    // avg(x) over w10 appears 4x, count 2x, stddev 1x — 7 syntactic, 3 distinct
    df.select($"k", $"seq",
      avg($"x").over(w10).as("m"),
      (avg($"x").over(w10) + lit(2) * stddev($"x").over(w10)).as("hi"),
      (avg($"x").over(w10) - count($"x").over(w10)).as("lo"),
      (avg($"x").over(w10) * count($"x").over(w10)).as("prod"))
  }

  test("duplicate window expressions collapse to one per distinct aggregate") {
    val counts = windowExprCounts(syntheticDf.queryExecution.optimizedPlan)
    assert(counts.nonEmpty)
    counts.foreach { case (total, distinct) =>
      assert(total == distinct, s"Window kept $total exprs for $distinct distinct")
    }
    // and the collapse actually happened (3 distinct, not 7 kept)
    assert(counts.map(_._1).sum == 3)
  }

  test("results are bit-identical with and without the rule") {
    val withRule = syntheticDf.collect()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.DedupWindowExpressions")
    try {
      val baseline = syntheticDf
      // the exclusion must actually disable the rule, or this test
      // compares the rule against itself
      val counts = windowExprCounts(baseline.queryExecution.optimizedPlan)
      assert(counts.map(_._1).sum == 7,
        s"excludedRules did not disable the rule: $counts")
      assert(baseline.collect().toSeq == withRule.toSeq)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("w24_roll_stats plans one aggregate per distinct window expression") {
    val df = graft.operators.WindowsAdvanced.queries("w24_roll_stats")(spark, sfDir)
    val counts = windowExprCounts(df.queryExecution.optimizedPlan)
    counts.foreach { case (total, distinct) =>
      assert(total == distinct, s"Window kept $total exprs for $distinct distinct")
    }
    // before the rule this query carried 49 window expressions (12
    // distinct) in its sliding-frame Window plus 3 copies of the lag
    assert(counts.map(_._1).sum <= 15, s"expected <=15 window exprs, got $counts")
  }

  test("nondeterministic window expressions are not collapsed") {
    // the analyzer itself merges SYNTACTIC duplicates before any
    // optimizer rule runs, so exercise the guard directly: a Window
    // node carrying two aliases of one nondeterministic expression
    // (what a future analyzer change could hand the rule) must keep
    // both — two draws, not one
    // (PullOutNondeterministic projects rand below the Window in any
    // ANALYZED plan, so the tree is built by hand here)
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal, Rand}
    val df = (1 to 10).map(i => (i % 2, i)).toDF("k", "seq")
    val w = W.partitionBy($"k").orderBy($"seq").rowsBetween(-1, 0)
    val detBase0 = df.select($"k", sum($"seq".cast("double")).over(w).as("a"))
    val win = detBase0.queryExecution.optimizedPlan
      .collect { case x: Window => x }.head
    val det = win.windowExpressions.collectFirst { case a: Alias => a }.get
    val ndChild = det.child.transform {
      case _: AttributeReference => Rand(Literal(7L), hideSeed = true)
    }
    assert(!ndChild.deterministic, "fixture must be nondeterministic")
    val doubled = win.copy(windowExpressions =
      Seq(Alias(ndChild, "a")(), Alias(ndChild, "dup")()))
    val kept = DedupWindowExpressions(doubled)
      .collect { case x: Window => x.windowExpressions.size }.sum
    assert(kept == 2, s"nondeterministic windows collapsed to $kept")
    // and the same shape with a deterministic child DOES collapse
    val detBase = df.select($"k", sum($"seq").over(w).as("a"))
    val detWin = detBase.queryExecution.optimizedPlan
      .collect { case x: Window => x }.head
    val detFirst = detWin.windowExpressions.collectFirst { case a: Alias => a }.get
    val detDoubled = detWin.copy(windowExpressions =
      Seq(detFirst, Alias(detFirst.child, "dup")()))
    val detKept = DedupWindowExpressions(detDoubled)
      .collect { case x: Window => x.windowExpressions.size }.sum
    assert(detKept == 1, s"deterministic duplicate kept $detKept exprs")
  }
}
