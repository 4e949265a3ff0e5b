package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical backward as-of join: a per-partition merge of two sides
  * co-partitioned on the key and sorted by (key, ts).
  *
  * Scale shape: ONE hash exchange per side (none if a child is
  * already partitioned on the key — e.g. a bucketed store), then a
  * single streaming pass per partition holding exactly one buffered
  * right row — O(1) memory regardless of key cardinality or skew, no
  * window machinery, no union amplification. This is the plan the
  * union+last_value formulation approximates; here it is a
  * first-class operator with its own distribution/ordering contract
  * so Catalyst places the exchanges and sorts.
  */
case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val outAttrs = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind with right-side nullability forced on, or the projection
      // codegen skips null checks and reads 0 from the null-fill row
      val proj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // one-row lookahead over the right side; the last right row that
      // satisfied (key, ts ≤) is the only state kept
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk != null && lt != null) {
          var continue = rHead != null
          while (continue) {
            val rk = rKeyB.eval(rHead)
            val rt = rTsB.eval(rHead)
            val consume =
              if (rk == null || rt == null) true // null keys never match; skip
              else {
                val c = keyOrd.compare(rk, lk)
                c < 0 || (c == 0 && tsOrd.compare(rt, lt) <= 0)
              }
            if (consume) {
              if (rk != null && rt != null) {
                lastMatch = rHead.copy() // rows are reused by the iterator
                // re-evaluate the key from the COPY: for buffer-backed
                // types (UTF8String, binary) rk is a view into the
                // reused row and would mutate on the next advance
                lastMatchKey = rKeyB.eval(lastMatch)
              }
              rHead = if (rIter.hasNext) rIter.next() else null
              continue = rHead != null
            } else continue = false
          }
        }
        val matched = lk != null && lt != null && lastMatchKey != null &&
          keyOrd.compare(lastMatchKey, lk) == 0
        if (matched) numMatched += 1
        numOutputRows += 1
        proj(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
