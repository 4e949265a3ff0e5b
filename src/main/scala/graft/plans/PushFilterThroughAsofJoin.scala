package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst stops predicate pushdown at nodes it doesn't know, so a
  * `Filter` above [[AsofJoin]] would otherwise force both children to
  * scan everything. This injected optimizer rule restores pushdown:
  *
  *  - conjuncts referencing only left-side attributes move below the
  *    join into the left child;
  *  - conjuncts referencing ONLY the left join key additionally
  *    mirror to the right child with the key attribute substituted
  *    (an as-of match shares its key, so pruning right rows whose key
  *    can't match is semantics-preserving — exactly what built-in
  *    join pushdown does for equi-joins).
  *
  * Right-side-only predicates must NOT push: the as-of is
  * right-outer-ish (unmatched left rows carry nulls) and, more
  * fundamentally, removing right rows changes which row is "latest".
  */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoin) =>
      val leftOut = aj.left.outputSet
      val preds = splitConjunctivePredicates(cond)
      // only the deterministic PREFIX may move (SPARK-13473 semantics:
      // pushing a later deterministic conjunct past an earlier
      // non-deterministic one changes which rows the latter sees)
      val (candidates, nonDetTail) = preds.span(_.deterministic)
      val (leftOnly, candRest) = candidates.partition(p =>
        p.references.subsetOf(leftOut))
      val rest = candRest ++ nonDetTail
      if (leftOnly.isEmpty) f
      else {
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        // mirror key-only conjuncts onto the right key
        val mirrored = (aj.leftKey, aj.rightKey) match {
          case (lk: Attribute, rk: Attribute) =>
            leftOnly
              .filter(p => p.references.size == 1 &&
                p.references.head.semanticEquals(lk))
              .map(_.transform {
                case a: Attribute if a.semanticEquals(lk) => rk
              }.asInstanceOf[Expression])
          case _ => Seq.empty
        }
        val newRight = mirrored.reduceOption(And)
          .map(Filter(_, aj.right)).getOrElse(aj.right)
        val newAj = aj.copy(left = newLeft, right = newRight)
        rest.reduceOption(And).map(Filter(_, newAj)).getOrElse(newAj)
      }
  }
}
