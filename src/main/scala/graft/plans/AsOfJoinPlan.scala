package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.TimestampType

/** The as-of join as a first-class Catalyst operator — the full custom-
  * operator ladder (SURVEY.md §4.3 rung c): logical node → planner
  * strategy → physical merge-sweep exec, registered through
  * SparkSessionExtensions ([[GraftExtensions]]) or per-session via
  * [[org.apache.spark.sql.graft.Bridge.addStrategy]].
  *
  * Why a custom operator when the union+window formulation
  * ([[graft.operators.AsOfJoin]]) already runs in one shuffle: the
  * window plan materializes a combined (left + right) sort run and
  * drags a nullable right-payload struct through every row of it;
  * the merge exec co-partitions and co-sorts the two sides separately
  * (smaller sort runs) and sweeps them with O(1) state — the classic
  * time-series-join physical design (kdb aj, pandas merge_asof, flint).
  * Semantics are identical (backward, inclusive, per-key, optional
  * tolerance) and the DuckDB oracle checks both paths (q39/q60).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Option[Long]) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require(leftTime.dataType == TimestampType &&
    rightTime.dataType == TimestampType,
    "as-of time columns must be timestamps")

  /** Left columns as-is; every right column nullable (unmatched rows). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push left-side filters below [[AsOfJoinNode]].
  *
  * Catalyst's own PushPredicateThroughJoin only knows Join nodes, so a
  * filter above a custom operator would otherwise run AFTER the join —
  * scanning and sweeping rows the query immediately discards. Pushing a
  * LEFT-side predicate is semantics-preserving for an as-of join:
  * dropping a left row never changes any other row's match, and the
  * right side is untouched. RIGHT-side predicates must NOT push (a
  * filter on the matched payload selects a different "latest" row than
  * filtering the join's output — the classic as-of pushdown trap).
  */
object AsOfJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinNode) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(leftOnly.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Merge-sweep backward as-of join.
  *
  * Required distribution/ordering make EnsureRequirements co-partition
  * both sides on the key and sort each side by (key, time) — exactly the
  * SortMergeJoin contract. Per partition, a single forward pass holds
  * the latest right row at-or-before the left cursor (one row of state);
  * left rows stream out in their sort order, joined to the held row when
  * keys match (and the optional tolerance holds), else null-extended.
  *
  * Cost: sort + ONE shuffle per side, O(|L|+|R|) sweep, O(1) memory —
  * no per-key hashing, no window buffering. Ties among right rows at the
  * same (key, time) resolve to the last row in sort order (matches the
  * union+window formulation's max-struct tie-break when times are
  * unique; with duplicate (key, time) right rows the winner among the
  * tied group is partition-order-dependent in both formulations).
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = toleranceUs
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else new Iterator[InternalRow] {
        private val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        private val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        private val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
        private val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
        private val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        private val nullRight = new GenericInternalRow(rOut.size)
        private val joined = new JoinedRow
        // Parent operators (Sort, Exchange, …) require UnsafeRow input,
        // so the JoinedRow is flattened through a result projection —
        // the same contract SortMergeJoinExec honours.
        private val resultProj = UnsafeProjection.create(allOut, allOut)
        private val rBuf = rIter.buffered
        // O(1) sweep state: the latest right row at-or-before the cursor
        private var heldKey: UnsafeRow = _
        private var heldRow: InternalRow = _
        private var heldTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        /** SQL-equi-join null semantics: a NULL key or NULL time on
          * either side never matches (left rows still emit, null-
          * extended). Rows sort nulls-first, so null right rows are
          * consumed before any non-null key can hold them. */
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          if (lKey.anyNull || lTimeRow.isNullAt(0)) {
            return resultProj(joined(l, nullRight))
          }
          val lTime = lTimeRow.getLong(0)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val rTimeRow = rTimeProj(rBuf.head)
            if (rKey.anyNull || rTimeRow.isNullAt(0)) {
              rBuf.next() // never a valid match under SQL semantics
            } else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0 || (cmp == 0 && rTimeRow.getLong(0) <= lTime)) {
                heldKey = rKey.copy()
                heldTime = rTimeRow.getLong(0)
                heldRow = rBuf.next().copy()
              } else advancing = false
            }
          }
          val matched = heldRow != null &&
            keyOrd.compare(heldKey, lKey) == 0 &&
            tol.forall(t => lTime - heldTime <= t)
          resultProj(if (matched) joined(l, heldRow) else joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator. */
object AsOfJoinNative {

  /** Backward as-of join through [[AsOfJoinExec]]. Right columns come
    * back `prefix`-renamed (fresh exprIds — required for self-joins);
    * right key columns are dropped from the result. Registers the
    * planner strategy on the session if missing. */
  def backward(leftDf: DataFrame, rightDf: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      prefix: String = "asof_", toleranceSec: Option[Long] = None): DataFrame = {
    val spark = leftDf.sparkSession
    Bridge.addStrategy(spark, AsOfJoinStrategy)
    Bridge.addOptimization(spark, AsOfJoinPushdown)
    // normalize TIMESTAMP_NTZ time columns (the exec compares raw micros,
    // so a consistent cast on both sides preserves order and diffs)
    def normTs(df: DataFrame, c: String): DataFrame =
      if (df.schema(c).dataType == TimestampType) df
      else df.withColumn(c, col(c).cast(TimestampType))
    val l = normTs(leftDf, leftTime)
    val renamed = normTs(rightDf, rightTime).select(
      rightDf.columns.map(c => col(c).as(prefix + c)).toIndexedSeq: _*)
    val lPlan = Bridge.analyzed(l)
    val rPlan = Bridge.analyzed(renamed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)),
      keyCols.map(k => attr(rPlan, prefix + k)),
      attr(lPlan, leftTime),
      attr(rPlan, prefix + rightTime),
      toleranceSec.map(_ * 1000000L))
    Bridge.ofRows(spark, node)
      .drop(keyCols.map(k => prefix + k): _*)
  }
}
