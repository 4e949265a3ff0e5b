package graft

import graft.operators.Relational
import graft.sources.Tables

/** Skew-validation bench for the salted join's three arms — the
  * comparison the suite bench can't show (only the production arm is a
  * registered query):
  *
  *   - `plain`: the unprotected shuffle join — the baseline a hot key
  *     punishes;
  *   - `salted_all`: unconditional salting — every key spread, the
  *     dimension replicated `salts`× across the board (the round-5
  *     shape, kept as the ceiling/overhead arm);
  *   - `salted_targeted`: the production operator — only sample-
  *     detected hot keys salt ([[Relational.q24SaltedJoin]]).
  *
  * Run against the uniform replica and the `skew` replica
  * ([[ScaleData]] mode) and compare: targeted ≈ plain on uniform data
  * (the detection pass is the only overhead), targeted ≪ plain-tail on
  * a hot key, and targeted ≤ salted_all everywhere. Same methodology
  * as [[Bench]]: noop sink, untimed warm pass, min of N timed passes,
  * one compact JSON line last.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = GraftSession.local(cpus)
    val t = Tables(spark, sfDir)
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "plain" -> (() => Relational.q24PlainJoin(t.lineitem, t.orders)),
      "salted_all" -> (() => Relational.q24SaltedJoinAll(t.lineitem, t.orders)),
      "salted_targeted" -> (() => Relational.q24SaltedJoin(t.lineitem, t.orders)))
    def runOnce(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, fn) => runOnce(fn) } // warm-up (JIT + codegen)
    val mins = arms.map { case (name, fn) =>
      name -> (1 to passes).map(_ => runOnce(fn)).min
    }
    def r(v: Double) = math.rint(v * 1e4) / 1e4
    val qs = mins.map { case (n, v) => s"""${JsonUtil.str(n)}:${r(v)}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"q24_arms","passes":$passes,"queries":$qs,""" +
      s""""sf":${JsonUtil.str(sfDir)}}""")
    spark.stop()
  }
}
