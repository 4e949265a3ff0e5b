package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy for graft's custom logical operators — injected
  * either via `spark.sql.extensions=graft.GraftExtensions` or
  * per-session through `spark.experimental.extraStrategies` (the
  * [[graft.operators.Temporal]] API self-registers, so the operator
  * works in any session).
  */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
