package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit rolling polynomial document fingerprint (Karp–Rabin): two
  * independent 31-bit-prime rolling hashes over the string's code
  * points, packed into one long — the codegen'd twin of the
  * interpreted `aggregate(split(text, ''), ...)` fold in
  * [[graft.operators.TextOps.fingerprint]], which allocates a
  * one-char-string array element per character. One pass and a single
  * transient String per row here (the per-character allocations are
  * what the fold pays for).
  *
  * Exactness contract: `split(text, '')` yields one code point per
  * element and `ascii(ch)` is that code point, so folding
  * `acc * 1000003 + codePoint (mod p)` over code points reproduces
  * the declarative fold bit-for-bit (spec-checked), ASCII or not.
  * Each step stays < 2^51 — ANSI-overflow-safe.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(a: Any): Any =
    RollingFingerprint.compute(a.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.RollingFingerprint.compute($v.toString());")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private final val Mul = 1000003L
  private final val P1 = 2147483647L // 2^31 - 1
  private final val P2 = 2147483629L

  /** Shared by eval and generated code so there is exactly one
    * definition of the fold.
    */
  def compute(s: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h1 = Math.floorMod(h1 * Mul + cp, P1)
      h2 = Math.floorMod(h2 * Mul + cp, P2)
      i += Character.charCount(cp)
    }
    h1 * 4294967296L + h2
  }
}
