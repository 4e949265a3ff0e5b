package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{ArrayMatchCount, CharEntropyStats, DotProduct,
  RollingFingerprint, ShingleFingerprints, SortedIntersectCount}

/** Session-extension entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")`
  * works anywhere the extension is configured:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b) takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_sorted_intersect(a, b) takes exactly two arguments")
        SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_match_count"),
      new ExpressionInfo(classOf[ArrayMatchCount].getName, "graft_match_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_match_count(a, b) takes exactly two arguments")
        ArrayMatchCount(children.head, children(1))
      }))
    def unary(name: String, build: Expression => Expression,
        cls: Class[_]): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 1, s"$name(text) takes exactly one argument")
          build(children.head)
        }))
    unary("graft_fingerprint", RollingFingerprint, classOf[RollingFingerprint])
    unary("graft_shingle_fps", ShingleFingerprints, classOf[ShingleFingerprints])
    unary("graft_char_entropy", CharEntropyStats, classOf[CharEntropyStats])
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
  }
}
