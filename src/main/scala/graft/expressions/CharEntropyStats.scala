package graft.expressions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character histogram → (distinct_chars, n_chars,
  * entropy) in ONE codegen'd pass. The declarative formulation —
  * `explode(split(text, ''))` → per-(doc, ch) count → per-doc sum —
  * turns every character of the corpus into a shuffled row through
  * two doc-keyed hash aggregates, for a quantity that is a pure
  * per-row function of `text`. Here the row never leaves the scan: a
  * code-point histogram is built in place and the exact same
  * arithmetic runs over it.
  *
  * Exactness contract (entropy is bit-identical to the declarative
  * twin, spec-checked): each class term `c·log₂(c)` uses
  * `Math.log(x)/Math.log(2)` — the literal definition of Spark's
  * `LOG2` — and is cast to DECIMAL(28,12) exactly as Spark's
  * double→decimal cast does (`BigDecimal.valueOf`, i.e.
  * `Double.toString`, then HALF_UP to scale 12); the decimal sum is
  * exact so per-class order is immaterial; the final
  * `round(log₂(n) − sl/n, 6)` replicates Spark's `Round`
  * (`BigDecimal.valueOf` + HALF_UP). Characters are code points,
  * matching `split(text, '')`'s per-code-point elements.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("distinct_chars", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(a: Any): Any =
    CharEntropyStats.compute(a.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.CharEntropyStats.compute($v.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  private final val Log2 = Math.log(2.0)

  /** Shared by eval and generated code — one definition of the scan. */
  def compute(s: String): InternalRow = {
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, _ + _)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    var sl = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sl = sl.add(java.math.BigDecimal.valueOf(c * (Math.log(c) / Log2))
        .setScale(12, RoundingMode.HALF_UP))
    }
    val entropy = Math.log(n.toDouble) / Log2 - sl.doubleValue() / n.toDouble
    new GenericInternalRow(Array[Any](counts.size().toLong, n,
      java.math.BigDecimal.valueOf(entropy).setScale(6, RoundingMode.HALF_UP)
        .doubleValue()))
  }
}
