package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Collapses DUPLICATE window expressions inside one logical [[Window]]
  * operator (r15 optimization round, guide §1.2 step 2 / §4).
  *
  * Catalyst extracts one window expression per SYNTACTIC occurrence and
  * never common-subexpression-eliminates them: a composite indicator
  * that reuses `avg(x) OVER w` in five output columns plans five
  * identical aggregates, and the physical window evaluates each sliding
  * frame per expression per row — O(rows × frame × copies). Measured on
  * this registry before the rule: `w24_roll_stats` carried 49 window
  * expressions of which only 12 were distinct (`avg(ret) OVER w10` ×15,
  * two `collect_list` quantile buffers per percentile instead of one),
  * `w7_bollinger` 15/3, the rolling-correlation family ~3× — the whole
  * indicator suite pays frame-sized work per TEXTUAL reference instead
  * of per distinct aggregate. At 100 TB the waste scales with the fact
  * table, so the fix is an engine rule, not a per-query rewrite.
  *
  * The rewrite keeps the FIRST occurrence of each canonicalized window
  * expression and redirects every reference to a dropped duplicate at
  * the kept attribute ([[LogicalPlan.transformUpWithNewOutput]] carries
  * the remap through ancestor operators). Only deterministic
  * expressions collapse — two syntactic copies of a nondeterministic
  * expression are two independent draws and must stay distinct.
  * Results are bit-identical by construction: the kept expression IS
  * the dropped one (same function, same frame, same partition/order),
  * evaluated once instead of n times. Idempotent, so safe under the
  * fixed-point operator-optimization batch it is injected into.
  */
object DedupWindowExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithNewOutput {
      case w: Window if hasDupes(w.windowExpressions) =>
        val seen = scala.collection.mutable.LinkedHashMap
          .empty[org.apache.spark.sql.catalyst.expressions.Expression, Alias]
        val kept = Vector.newBuilder[NamedExpression]
        val remap = Vector.newBuilder[(Attribute, Attribute)]
        w.windowExpressions.foreach {
          case a: Alias if a.child.deterministic =>
            seen.get(a.child.canonicalized) match {
              case Some(first) => remap += (a.toAttribute -> first.toAttribute)
              case None        => seen(a.child.canonicalized) = a; kept += a
            }
          case ne => kept += ne
        }
        val mapping = remap.result()
        if (mapping.isEmpty) w -> Nil
        else w.copy(windowExpressions = kept.result()) -> mapping
    }

  private def hasDupes(exprs: Seq[NamedExpression]): Boolean = {
    val seen = scala.collection.mutable.HashSet
      .empty[org.apache.spark.sql.catalyst.expressions.Expression]
    exprs.exists {
      case a: Alias if a.child.deterministic => !seen.add(a.child.canonicalized)
      case _ => false
    }
  }
}
