package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: (Long, String, String)*) =
    texts.toDF("doc_id", "text", "lang")

  test("token counts: whitespace vs BPE-ish regex") {
    val out = TextOps.tokens(docs((1L, "the cat sat", "en")).select("doc_id", "text"))
      .collect().head
    assert(out.getLong(1) == 3) // whitespace
    assert(out.getLong(2) == 3) // letter runs
    val punct = TextOps.tokens(docs((1L, "hello, world! 42", "en"))
      .select("doc_id", "text")).collect().head
    assert(punct.getLong(1) == 3)
    assert(punct.getLong(2) == 5) // hello , world ! 42
  }

  test("quality: stopword ratio and score are exact") {
    val out = TextOps.quality(docs((1L, "the cat sat on the mat", "en"))
      .select("doc_id", "text")).collect().head
    assert(out.getLong(1) == 6)         // n_words
    assert(out.getLong(2) == 2)         // n_stop ('the' twice)
    assert(out.getDouble(3) == 0.333333) // stop_ratio rounded
  }

  test("langid picks the dominant marker language deterministically") {
    val out = TextOps.langId(docs(
      (1L, "word the word the word", "en"),
      (2L, "mot le mot le mot", "fr"),
      (3L, "wort der wort", "de"))).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("en", "fr", "de"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L))
  }

  test("fingerprint: equal texts collide, different texts differ") {
    val out = TextOps.fingerprint(docs(
      (1L, "same text here", "en"), (2L, "same text here", "en"),
      (3L, "different text", "en")).select("doc_id", "text"))
      .collect().map(_.getLong(1))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }
}
