package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the whole-operator tier of
  * the extension ladder (custom `LogicalPlan` + `Rule[LogicalPlan]` +
  * `SparkStrategy` + `SparkPlan`): for every left row, attach the last
  * right row of the same key whose time is ≤ the left time (backward
  * as-of, `DuckDB ASOF LEFT JOIN` / pandas `merge_asof` semantics).
  *
  * This is the one reference operator family Spark genuinely cannot
  * express as a single relational node: the composed forms are either
  * union + last-ignore-nulls window ([[graft.operators.Joins.j6AsofJoin]]
  * — two passes over the union, full-frame window state) or an
  * inequality join + per-key max (quadratic blow-up before the agg).
  * The physical operator is one co-partitioned MERGE WALK: each side
  * shuffles once on its keys, sorts by (key, time) — the exchange
  * Catalyst would insert for any keyed op — and a single forward pass
  * per partition keeps O(1) state (the last right row seen per key).
  * 100 TB shape: no buffered groups, no window frames, spillable sort
  * on both sides, output streamed.
  *
  * Registered through the same two public hooks the session extension
  * uses (`injectOptimizerRule`/`injectPlannerStrategy` ≙
  * `experimental.extraOptimizations`/`extraStrategies`); see
  * [[GraftExtensions]] for the config-driven path. */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: deterministic predicates that touch only the LEFT
  * side commute with the as-of join (every output row embeds exactly
  * one left row), so they move below it — onto the scan, where they
  * prune partitions and parquet row groups instead of filtering the
  * joined stream. Right-side predicates do NOT commute (dropping a
  * right row can change which row is "last at or before t"), so they
  * stay put. */
object PushLeftFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner strategy: lower the logical as-of node to the merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: children are hash-clustered on their
  * keys and sorted by (key, time) — EnsureRequirements inserts the
  * exchanges/sorts exactly as it would for a sort-merge join — then
  * each co-partition pair is merged in one forward pass. State per
  * partition is ONE buffered right row (the candidate match for the
  * current key), so memory is O(1) regardless of key cardinality or
  * skew; ties (right time == left time) match, like `ASOF JOIN ... ON
  * l.t >= r.t`. Left rows with no key-time predecessor emit nulls
  * (left-outer semantics). */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, left.output ++ right.output)
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow

      val needTolerance = toleranceUs.isDefined
      val tolerance = toleranceUs.getOrElse(0L)

      new Iterator[InternalRow] {
        // head of the un-consumed right stream (+ its key, copied out of
        // the projection's reused buffer only when the key CHANGES — runs
        // of equal keys, the common case in time-series, share one copy)
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        // last right row of the CURRENT left key with time <= left time
        private var candidate: InternalRow = _
        private var candidateKey: UnsafeRow = _
        // candidate's time in its long representation (timestamp micros),
        // kept for the tolerance check — only read when toleranceUs is set
        private var candidateTime: Long = 0L
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            val k = rKeyProj(rHead)
            if (rHeadKey == null || keyOrd.compare(k, rHeadKey) != 0)
              rHeadKey = k.copy()
          } else { rHead = null; rHeadKey = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          // consume right rows at or before (lKey, lTime); the last one
          // with a matching key is the as-of match. Distinct projection
          // objects per side — each reuses its own buffer, so comparing
          // their outputs directly is safe. One key comparison per row.
          val lTime = lTimeProj(lRow)
          var done = rHead == null
          while (!done) {
            val kc = keyOrd.compare(rHeadKey, lKey)
            if (kc > 0 || (kc == 0 && timeOrd.compare(rTimeProj(rHead), lTime) > 0)) {
              done = true
            } else {
              if (kc == 0) {
                candidate = rHead.copy()
                candidateKey = rHeadKey
                if (needTolerance) {
                  val tr = rTimeProj(candidate)
                  candidateTime = if (tr.isNullAt(0)) Long.MinValue else tr.getLong(0)
                }
              }
              advanceRight()
              done = rHead == null
            }
          }
          // a null right time sorts first and can end up as the candidate;
          // its Long.MinValue sentinel would overflow the subtraction below
          // (wrapping negative = "within tolerance"), so reject it explicitly
          val matched = candidate != null && keyOrd.compare(candidateKey, lKey) == 0 &&
            (!needTolerance ||
              (!lTime.isNullAt(0) && candidateTime != Long.MinValue &&
                lTime.getLong(0) - candidateTime <= tolerance))
          numOutputRows += 1
          if (matched) numMatched += 1
          resultProj(joined(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }
}

/** DataFrame-level API + session wiring for the as-of operator. */
object AsOfJoinOps {
  /** Idempotently add the rule + strategy through the public
    * `experimental` hooks (the in-code twin of the
    * `spark.sql.extensions` config path). */
  def install(spark: SparkSession): Unit = synchronized {
    val e = spark.experimental
    if (!e.extraStrategies.contains(AsOfJoinStrategy))
      e.extraStrategies = e.extraStrategies :+ AsOfJoinStrategy
    if (!e.extraOptimizations.contains(PushLeftFilterThroughAsOf))
      e.extraOptimizations = e.extraOptimizations :+ PushLeftFilterThroughAsOf
  }

  /** Backward as-of join: for each `left` row, the last `right` row
    * with equal keys and `rightTime <= leftTime`; unmatched left rows
    * keep null right columns. `toleranceUs` additionally nulls a match
    * staler than the bound (`leftTime − rightTime > tolerance`) — the
    * quote-staleness cap; requires long-backed time columns (timestamp
    * micros or bigint). The right side is re-aliased first so a shared
    * lineage (both frames derived from one scan) can't leak duplicate
    * attribute ids into the join output. */
  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val r = right.select(right.columns.toIndexedSeq.map(c => right(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def resolve(plan: LogicalPlan, n: String): Expression =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = resolve(lPlan, leftTime)
    val rt = resolve(rPlan, rightTime)
    if (toleranceUs.isDefined) {
      val ok = Seq(lt.dataType, rt.dataType).forall(t =>
        t == org.apache.spark.sql.types.TimestampType ||
          t == org.apache.spark.sql.types.LongType)
      require(ok, s"tolerance needs long-backed times, got ${lt.dataType}/${rt.dataType}")
    }
    GraftShim.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
      lt, rt, toleranceUs))
  }
}
