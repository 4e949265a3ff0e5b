package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical backward as-of join (SURVEY.md §4, custom-operator path c):
  * for every left row, match the single latest right row with the same
  * key and right ts ≤ left ts — the reference's "response correlates
  * to the most recent matching request" (`messages/base.py:593`) as a
  * whole-plan operator.
  *
  * Both key/ts expression pairs must be resolved attributes of the
  * respective child (the [[graft.operators.Temporal]] API constructs
  * the node from analyzed children, so the node arrives resolved; the
  * right child must carry fresh exprIds — project-with-alias — when
  * both sides derive from the same scan).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {

  /** Right side is outer: unmatched left rows carry nulls. */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}
