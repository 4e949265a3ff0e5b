package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The text family's per-row counting statistics in ONE codegen'd
  * character scan: `struct(n_words, n_stop, n_bpe, n_digits)`.
  *
  * The declarative formulations each rescan and re-allocate per row —
  * `size(split(text, ' '))` builds the word array,
  * `size(filter(split(...), w -> w IN ...))` adds an interpreted
  * higher-order lambda (never enters whole-stage codegen),
  * `size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`
  * materializes every match through the regex engine just to count
  * them, and `length(text) - length(regexp_replace(text, '[0-9]',
  * ''))` builds a digit-stripped copy. All four are counts a single
  * pass over the code points produces exactly:
  *
  *  - `n_words`: split-on-' ' token count = spaces + 1 (consecutive
  *    spaces yield empty tokens and the trailing empty token counts,
  *    exactly like `split`'s limit -1 semantics);
  *  - `n_stop`: tokens equal to "the" or "a" (the shared stopword
  *    list of `TextOps.stopCount`);
  *  - `n_bpe`: the BPE-ish pre-tokenizer count — maximal `[a-z]`
  *    runs + maximal `[0-9]` runs + one per other non-space code
  *    point, which is precisely what the leftmost-first regex
  *    alternation `[a-z]+|[0-9]+|[^a-z0-9 ]` matches;
  *  - `n_digits`: `[0-9]` code points.
  *
  * Bit-identical to the declarative twins (spec-checked, including
  * empty text — one empty word — multi-space runs and non-ASCII code
  * points, which the regex classes treat per code point exactly as
  * the scan does).
  */
case class TextScanStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = TextScanStats.Schema

  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(a: Any): Any =
    TextScanStats.compute(a.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.TextScanStats.compute($v.toString());")

  override protected def withNewChildInternal(newChild: Expression): TextScanStats =
    copy(child = newChild)
}

object TextScanStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false)))

  /** Shared by eval and generated code — one definition of the scan. */
  def compute(s: String): InternalRow = {
    val n = s.length
    var nWords = 1L
    var nStop = 0L
    var nBpe = 0L
    var nDigits = 0L
    // current token bounds for the stopword check
    var tokStart = 0
    // previous char class for run detection: 0 = none/other, 1 = [a-z], 2 = [0-9]
    var prev = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') {
        nWords += 1
        if (isStop(s, tokStart, i)) nStop += 1
        tokStart = i + 1
        prev = 0
        i += 1
      } else if (c >= 'a' && c <= 'z') {
        if (prev != 1) nBpe += 1
        prev = 1
        i += 1
      } else if (c >= '0' && c <= '9') {
        if (prev != 2) nBpe += 1
        nDigits += 1
        prev = 2
        i += 1
      } else {
        // one regex match (and one length() unit) per CODE POINT
        nBpe += 1
        prev = 0
        i += Character.charCount(s.codePointAt(i))
      }
    }
    if (isStop(s, tokStart, n)) nStop += 1
    new GenericInternalRow(Array[Any](nWords, nStop, nBpe, nDigits))
  }

  // token == "the" || token == "a" over [from, until)
  private def isStop(s: String, from: Int, until: Int): Boolean =
    (until - from == 1 && s.charAt(from) == 'a') ||
      (until - from == 3 && s.charAt(from) == 't' &&
        s.charAt(from + 1) == 'h' && s.charAt(from + 2) == 'e')
}
