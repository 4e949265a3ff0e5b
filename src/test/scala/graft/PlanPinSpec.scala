package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the custom operators registered through
  * `GraftExtensions`. These queries have semantically-equal fallback
  * formulations (a union-window as-of, for one), so a Spark upgrade
  * or a lost extension registration would keep results green while
  * silently dropping the custom operator — only a plan assertion
  * catches that.
  */
class PlanPinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered ev_asof_join executes on the custom AsofJoinExec, not a fallback") {
    val df = SparkEntry.queries("ev_asof_join")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"),
      s"ev_asof_join must plan through graft.plans.AsofJoinExec — extension " +
        s"registration or strategy match regressed; got:\n$plan")
    // and the custom operator is actually runnable, not just planned
    assert(df.limit(1).count() >= 0)
  }

  test("the extension's strategy and pushdown rule are registered in the session") {
    val injected = spark.sessionState.planner.strategies.map(_.getClass.getName)
    assert(injected.exists(_.contains("graft")),
      s"graft strategy missing from planner: $injected")
    val rules = spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .map(_.getClass.getName)
    assert(rules.exists(_.contains("PushFilterThroughAsofJoin")),
      s"graft pushdown rule missing from optimizer: $rules")
  }
}
