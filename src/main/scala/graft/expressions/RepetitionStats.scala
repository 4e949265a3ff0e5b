package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE codegen'd pass:
  * `struct(n_words, n_distinct_words, top_word_n, n_bigrams,
  * n_distinct_bigrams)` — every one a PER-DOCUMENT value, so the
  * declarative formulation's two corpus explodes and four
  * aggregation exchanges (words → (doc, w) counts → per-doc rollup;
  * bigram strings → (doc, b) counts → per-doc rollup) do distributed
  * work a single row-local hash table does for free. At 100 TB the
  * declarative shape shuffles the whole exploded corpus twice;
  * this runs at scan speed with zero exchanges.
  *
  * Exactness contract (spec-checked against the declarative twin):
  * words are `split(text, ' ')` tokens (consecutive spaces yield
  * empty tokens, the trailing empty token counts); bigrams are the
  * concatenations `ws[i] + ' ' + ws[i+1]` — distinctness over those
  * strings equals distinctness over the pairs because tokens cannot
  * contain the separator. Documents with fewer than two words yield
  * NULL (the declarative inner join drops them); callers filter
  * `IS NOT NULL` to reproduce that row set.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = RepetitionStats.Schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = graft.expressions.RepetitionStats.compute($v.toString());
      |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))

  /** Shared by eval and generated code — one definition of the scan.
    * Returns null for texts with fewer than two words.
    */
  def compute(s: String): InternalRow = {
    // token boundaries, split-on-' ' with empties kept
    val n = s.length
    var words = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') words += 1; i += 1 }
    if (words < 2) return null
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
    // word counts: token substring -> occurrences
    val wordCounts = new java.util.HashMap[String, Long](words * 2)
    var topN = 0L
    i = 0
    while (i < words) {
      val tok = s.substring(starts(i), ends(i))
      val c = wordCounts.merge(tok, 1L, (a, b) => a + b)
      if (c > topN) topN = c
      i += 1
    }
    // distinct bigram strings ws[i] + ' ' + ws[i+1]: since tokens are
    // adjacent in the source, the bigram IS the source substring
    // [starts(i), ends(i+1)) — no concatenation needed
    val bigrams = new java.util.HashSet[String](words * 2)
    i = 0
    while (i < words - 1) {
      bigrams.add(s.substring(starts(i), ends(i + 1)))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      words.toLong, wordCounts.size.toLong, topN,
      (words - 1).toLong, bigrams.size.toLong))
  }
}
