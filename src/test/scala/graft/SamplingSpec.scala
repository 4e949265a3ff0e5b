package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex2(id: Long): String =
    MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).take(1).mkString

  private def docs(rows: (Long, String, String, String)*) = {
    val full = rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong)
    }
    full.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("stratified sample keeps exactly the rows whose md5 bucket clears the stratum threshold") {
    val d = docs((0L until 200L).map(i =>
      (i, s"text $i", if (i % 3 == 0) "en" else "fr", s"src${i % 4}")): _*)
    val got = Sampling.stratifiedSample(d).collect().map(_.getLong(0)).toSet
    val expected = (0L until 200L).filter { i =>
      val thr = if (i % 3 == 0) "28" else "50"
      md5hex2(i) < thr
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 200) // actually samples, not all/none
  }

  test("domain mix quota takes at most N per source, deterministically") {
    val d = docs((0L until 120L).map(i => (i, s"t $i", "en", s"src${i % 3}")): _*)
    val out = Sampling.domainMixQuota(d, quota = 10).collect()
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc.keySet == Set("src0", "src1", "src2"))
    bySrc.values.foreach { g =>
      assert(g.length == 10)
      assert(g.map(_.getLong(2)).toSet == (1L to 10L).toSet)
    }
    // rerun is identical (pure function of the rows)
    val again = Sampling.domainMixQuota(d, quota = 10).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("packing assigns bins by prefix token sums within each source shard") {
    // 4 docs of 4 tokens each per source, budget 10:
    // cum_prev = 0,4,8,12 -> bins 0,0,0,1
    val d = docs((0L until 8L).map(i =>
      (i, "w w w w", "en", s"src${i % 2}")): _*)
    val out = Sampling.packSequences(d, budget = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // src0 holds ids 0,2,4,6 in doc_id order; src1 holds 1,3,5,7
    assert(out(0L) == 0 && out(2L) == 0 && out(4L) == 0 && out(6L) == 1)
    assert(out(1L) == 0 && out(3L) == 0 && out(5L) == 0 && out(7L) == 1)
  }
}
