package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd set-intersection size over two SORTED
  * `array<bigint>` columns: |A ∩ B| by a two-pointer merge —
  * O(|A| + |B|), no allocation, whole-stage-codegen friendly.
  *
  * The pair-verification primitive for the dedup family: with each
  * document's distinct shingle fingerprints pre-sorted once, a
  * candidate pair verifies with ONE row per pair instead of the
  * join-explode-regroup shape (pair × shingle rows through two
  * shuffles). At 153 k candidates × ~150 shingles that is 20 M+
  * shuffled rows replaced by 153 k merge calls inside codegen.
  *
  * Inputs must be sorted ascending and duplicate-free (both hold for
  * `sort_array(collect_set(...))`, and for `collect_list` over
  * already-distinct shingle fingerprints); a null element makes the
  * result NULL, mirroring SQL set semantics. The DuckDB oracle twin
  * is `len(list_intersect(a, b))` — order-insensitive, so the sort
  * precondition stays an implementation detail, not a semantic one.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { acc += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    // the merge stops at the shorter cursor; a null in the UNREACHED
    // tail must still null the result ("a null element makes the
    // result NULL" is a property of the arrays, not the merge path)
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    while (j < m) { if (y.isNullAt(j)) return null; j += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |long $acc = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |// nulls in the tail the merge never reached still null the result
         |while (!${ev.isNull} && $i < $n) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; } else { $i++; }
         |}
         |while (!${ev.isNull} && $j < $m) {
         |  if ($y.isNullAt($j)) { ${ev.isNull} = true; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
