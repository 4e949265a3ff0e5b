package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All distinct 3-word-shingle fingerprints of a document in ONE
  * codegen'd pass: the declarative formulation —
  * `split(text, ' ')` → `transform(sequence(...), 3-gram concat)` →
  * `array_distinct` → explode → [[RollingFingerprint]] — allocates a
  * words array, a shingle-string array and every concatenated shingle
  * per row, and the transform lambda is interpreted (higher-order
  * functions never enter whole-stage codegen). Here the text is
  * scanned once: word boundaries are tracked in place and each
  * 3-gram's dual-prime fold runs over the original string's code
  * points (token, space, token, space, token — the exact code-point
  * sequence of the concatenated shingle), so the fingerprints are
  * bit-identical to `RollingFingerprint(shingle)` (spec-checked
  * against the declarative twin). Output order is ascending (sorted
  * for dedup); every consumer aggregates, so order is immaterial.
  *
  * Mirrors `split(text, ' ')` semantics exactly: consecutive spaces
  * yield empty tokens, and a trailing empty token is kept (Spark's
  * regex split uses limit -1). Docs with fewer than three words yield
  * an empty array — the `size(w) >= 3` filter's behavior — which a
  * downstream explode drops.
  */
case class ShingleFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_fps"

  override def nullSafeEval(a: Any): Any =
    ShingleFingerprints.compute(a.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.ShingleFingerprints.compute($v.toString());")

  override protected def withNewChildInternal(newChild: Expression): ShingleFingerprints =
    copy(child = newChild)
}

object ShingleFingerprints {
  private final val Mul = 1000003L
  private final val P1 = 2147483647L // 2^31 - 1
  private final val P2 = 2147483629L
  private final val Space = ' '.toInt

  /** Shared by eval and generated code — one definition of the scan. */
  def compute(s: String): ArrayData = {
    val n = s.length
    // word boundaries: starts(i) .. ends(i) (exclusive), split on ' '
    // with trailing empties kept, exactly like split(text, ' ')
    var words = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') words += 1; i += 1 }
    if (words < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = n
    // fold token chars into both rolling hashes, range [from, until)
    val out = new Array[Long](words - 2)
    var g = 0
    while (g < words - 2) {
      var h1 = 0L
      var h2 = 0L
      var t = 0
      while (t < 3) {
        if (t > 0) { // the joining space
          h1 = Math.floorMod(h1 * Mul + Space, P1)
          h2 = Math.floorMod(h2 * Mul + Space, P2)
        }
        var j = starts(g + t)
        val until = ends(g + t)
        while (j < until) {
          val cp = s.codePointAt(j)
          h1 = Math.floorMod(h1 * Mul + cp, P1)
          h2 = Math.floorMod(h2 * Mul + cp, P2)
          j += Character.charCount(cp)
        }
        t += 1
      }
      out(g) = h1 * 4294967296L + h2
      g += 1
    }
    // distinct via sort + squash (order is immaterial downstream)
    java.util.Arrays.sort(out)
    var uniq = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, uniq))
  }
}
