package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the full custom-operator stack (logical node →
  * planner strategy → physical operator), injected via
  * [[GraftExtensions]]. Complements [[graft.operators.AsOfJoin]]'s
  * union+window formulation with a dedicated sort-merge physical
  * operator: each side is hash-clustered on its key and sorted by
  * (key, ts[, tie]) — the SAME distribution/ordering contract
  * SortMergeJoin declares, so EnsureRequirements plans the shuffles
  * and sorts, AQE coalesces them — and the merge itself is a single
  * forward pass per partition: the right pointer only ever advances,
  * state is ONE buffered row, so partition memory is O(1) regardless
  * of key skew (the window formulation holds a frame per key).
  *
  * Scope (documented contract, checked at construction): key and ts
  * are 64-bit-backed types (long / timestamp-micros); right-side ties
  * on (key, ts) resolve to the greatest `tie` value — a total order,
  * so results are deterministic under any partitioning.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Same contract as a shuffled equi-join: cluster each side on its
  // key; EnsureRequirements aligns the two hash partitionings.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // (key, ts) on the probe side; (key, ts, tie) on the reference side
  // so equal-(key, ts) ties have a total order — the LAST row in sort
  // order (max tie) is the match, deterministically.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of key/ts attributes must come from the respective child")
    val rightWidth = right.output.length
    val outAttrs = output
    // bind against the nullability-WIDENED right attributes: binding
    // to the child's non-nullable originals would codegen away the
    // null checks, reading 0s out of the all-null no-match row
    val allChildAttrs = outAttrs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // downstream operators (exchanges, aggregates) expect UnsafeRow
      val proj = UnsafeProjection.create(outAttrs, allChildAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var haveMatch = false
      var matchKey = 0L
      var matchRow: InternalRow = null

      lIter.map { lrow =>
        if (lrow.isNullAt(lkIdx) || lrow.isNullAt(ltIdx)) {
          proj(joined(lrow, nullRight))
        } else {
          val k = lrow.getLong(lkIdx)
          val t = lrow.getLong(ltIdx)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            if (r.isNullAt(rkIdx) || r.isNullAt(rtIdx)) { rBuf.next(); () }
            else {
              val rk = r.getLong(rkIdx)
              if (rk < k) { rBuf.next(); () }                // key passed: drop
              else if (rk == k && r.getLong(rtIdx) <= t) {
                // candidate: sort order guarantees later candidates
                // are >= in (ts, tie), so overwriting keeps the max.
                // copy(): sorter iterators reuse the backing row.
                matchRow = rBuf.next().copy()
                matchKey = rk
                haveMatch = true
              } else advancing = false                        // future row: stop
            }
          }
          if (haveMatch && matchKey == k) proj(joined(lrow, matchRow))
          else proj(joined(lrow, nullRight))
        }
      }
    }
  }
}
