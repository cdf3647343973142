package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** First-class as-of join: logical node + planner strategy + physical
  * merge-scan operator (the brief's rung (c): whole-operator semantics that
  * no built-in expresses directly — Spark has no ASOF join, and the
  * window-walk composition in [[graft.streaming.Sessionize.asofJoin]] pays
  * a union + null-struct padding it doesn't need).
  *
  * Semantics (identical to the composition and DuckDB's `ASOF LEFT JOIN`,
  * which oracles the gate): every left row picks the LATEST right row of
  * the same key with `right.ts <= left.ts` (inclusive); ties on right ts
  * resolve to the highest `rightSeq`; unmatched left rows keep nulls.
  *
  * Physical plan: both sides hash-cluster on the key and sort by
  * (key, ts[, seq]) — exactly a sort-merge join's requirements, so
  * EnsureRequirements inserts the two exchanges and sorts. Execution is
  * then ONE forward merge scan per partition: the right cursor never
  * rewinds, state is a single buffered row per key, and no intermediate
  * rows materialize. At 100 TB this is the minimal-shuffle plan for the
  * operator, and bucketed tables on the key plan with zero exchanges.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightSeq: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // the merge scan evals key/ts/seq straight to Long, so anything but
  // bigint columns must be rejected at ANALYSIS time — without this check
  // a construction path that skips asofJoinNative's validation would fail
  // mid-execution with a ClassCastException instead
  override lazy val resolved: Boolean = {
    val exprs = Seq(leftKey, rightKey, leftTs, rightTs, rightSeq)
    childrenResolved && exprs.forall(_.resolved) &&
      exprs.forall(_.dataType == org.apache.spark.sql.types.LongType)
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinNode]] → [[AsOfJoinExec]]. Injected via
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rs) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightSeq: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-cluster both sides on the key (same shape as SortMergeJoin: equal
  // expression arity → co-partitioned children, zipPartitions is valid)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightSeq, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    // bind the projection against the NULLABLE output attributes: binding
    // against right.output would mark the right fields non-nullable and
    // read garbage zeros instead of nulls on unmatched rows
    val schema = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightWidth)
        val project = UnsafeProjection.create(schema, schema)
        val rBuf = rIter.buffered
        // one retained right row: the latest in-horizon row of lastKey
        var hasLast = false
        var lastKey = 0L
        var lastRow: InternalRow = null
        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lkAny = lkB.eval(l)
            val ltAny = ltB.eval(l)
            if (lkAny == null || ltAny == null)
              return project(joined(l, nullRight))
            val lk = lkAny.asInstanceOf[Long]
            val lt = ltAny.asInstanceOf[Long]
            // advance the right cursor over everything at-or-before (lk, lt);
            // rows of earlier keys are drained (left is key-sorted too, so
            // they can never match a future left row)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val r = rBuf.head
              val rkAny = rkB.eval(r)
              val rtAny = rtB.eval(r)
              if (rkAny == null || rtAny == null) { rBuf.next(); () }
              else {
                val rk = rkAny.asInstanceOf[Long]
                if (rk < lk || (rk == lk && rtAny.asInstanceOf[Long] <= lt)) {
                  if (rk == lk) {
                    // row iterators reuse buffers: retain a copy
                    lastRow = rBuf.next().copy()
                    lastKey = rk
                    hasLast = true
                  } else rBuf.next()
                } else advancing = false
              }
            }
            val matched = hasLast && lastKey == lk
            project(joined(l, if (matched) lastRow else nullRight))
          }
        }
    }
  }
}
