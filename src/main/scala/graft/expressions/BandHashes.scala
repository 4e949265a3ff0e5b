package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH band hashes of a MinHash signature in one codegen'd pass:
  * band b (0-based) is the polynomial fold
  * `acc = floorMod(acc * 1000003 + mh[b*rows + i], 2^31 - 1)` over
  * its `rows` consecutive signature values — bit-identical to the
  * declarative `transform(sequence(0, bands-1), b ->
  * aggregate(slice(mh, b*rows+1, rows), 0L, (acc, x) ->
  * pmod(acc*1000003 + x, 2147483647)))` (spec-checked), which as a
  * higher-order function never enters whole-stage codegen and
  * allocates a sliced array plus a boxed accumulator per band. A NULL
  * signature element nulls its band's hash exactly like the `pmod`
  * fold; a signature shorter than `rows*bands` nulls the bands that
  * run past the end (`slice` pads with nothing and the empty-tail
  * fold would differ — out-of-range is a geometry bug, surfaced as
  * null buckets that join nothing rather than a wrong collision).
  */
case class BandHashes(child: Expression, rows: Int, bands: Int)
    extends UnaryExpression {

  require(rows > 0 && bands > 0, "rows and bands must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_band_hashes"

  override def nullSafeEval(a: Any): Any =
    BandHashes.compute(a.asInstanceOf[ArrayData], rows, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.BandHashes.compute($v, $rows, $bands);")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  private final val Mul = 1000003L
  private final val P = 2147483647L // 2^31 - 1

  /** Shared by eval and generated code — one definition of the fold. */
  def compute(mh: ArrayData, rows: Int, bands: Int): ArrayData = {
    val n = mh.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val from = b * rows
      if (from + rows > n) {
        out(b) = null
      } else {
        var acc = 0L
        var i = from
        var isNull = false
        while (i < from + rows && !isNull) {
          if (mh.isNullAt(i)) isNull = true
          else acc = Math.floorMod(acc * Mul + mh.getLong(i), P)
          i += 1
        }
        out(b) = if (isNull) null else java.lang.Long.valueOf(acc)
      }
      b += 1
    }
    new GenericArrayData(out)
  }
}
