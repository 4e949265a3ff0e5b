package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All multi-table hyperplane LSH signatures of a 64-dim
  * `array<double>` vector in ONE codegen'd pass: the vector is
  * materialized into a primitive array once, then every plane dot
  * product runs as a tight loop over it — versus the declarative
  * formulation (nTables × bitsPerTable separate `when(graft_dot(...) >
  * 0, ...)` branches) which re-reads the ArrayData with per-element
  * null checks ~100 times per row and inflates the generated method
  * past what Janino/JIT optimize well.
  *
  * Semantics are bit-identical to that formulation (see
  * [[graft.functions.VectorOps.lshTableKeys]]): result[t] = (t << 32)
  * | sign-bits of planes [t·bits, (t+1)·bits), each dot accumulated
  * strictly left-to-right in doubles; a non-64-dim vector yields NULL
  * (dropped by downstream explode), a null element sets no sign bits
  * (a null dot fails the `> 0` test in the declarative twin), and a
  * NaN dot SETS the bit (Spark SQL's GreaterThan ranks NaN above
  * every number, unlike Java's `>`).
  */
case class LshSignatures(child: Expression, planes: Array[Array[Double]],
    nTables: Int, bitsPerTable: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_keys"

  override def nullable: Boolean = true // null child or wrong dimension

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != 64) return null
    var anyNull = false
    val x = new Array[Double](64)
    var i = 0
    while (i < 64) {
      if (v.isNullAt(i)) anyNull = true else x(i) = v.getDouble(i)
      i += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = t.toLong << 32
      if (!anyNull) {
        var j = 0
        while (j < bitsPerTable) {
          val p = planes(t * bitsPerTable + j)
          var acc = 0.0
          var k = 0
          while (k < 64) { acc += x(k) * p(k); k += 1 }
          // NaN counts as > 0: Spark's GreaterThan ranks NaN largest
          if (acc > 0 || acc.isNaN) sig |= 1L << j
          j += 1
        }
      }
      out(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val anyNull = ctx.freshName("anyNull")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
         |if ($v.numElements() != 64) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $anyNull = false;
         |  double[] $x = new double[64];
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($v.isNullAt($i)) { $anyNull = true; } else { $x[$i] = $v.getDouble($i); }
         |  }
         |  long[] $out = new long[$nTables];
         |  for (int $t = 0; $t < $nTables; $t++) {
         |    long $sig = ((long) $t) << 32;
         |    if (!$anyNull) {
         |      for (int $j = 0; $j < $bitsPerTable; $j++) {
         |        double[] $p = $planesRef[$t * $bitsPerTable + $j];
         |        double $acc = 0.0;
         |        for (int $k = 0; $k < 64; $k++) { $acc += $x[$k] * $p[$k]; }
         |        /* NaN counts as > 0: Spark's GreaterThan ranks NaN largest */
         |        if ($acc > 0 || Double.isNaN($acc)) $sig |= 1L << $j;
         |      }
         |    }
         |    $out[$t] = $sig;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}
