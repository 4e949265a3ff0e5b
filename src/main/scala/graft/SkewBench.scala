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
    // Cluster-regime knob (round-6 verdict item 2): at 32 partitions a
    // 10% hot key gives its reducer only ~3× the average — the mild
    // regime. On a 1000-executor cluster shuffle partitions sit in the
    // thousands, where the same key is a 100–1000× imbalance. Raising
    // partitions single-node reproduces that reducer-IMBALANCE shape
    // (one straggler task vs many tiny ones) even though total cores
    // stay 32.
    val shufflePartitions =
      sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
    val spark = GraftSession.local(cpus)
    shufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    val t = Tables(spark, sfDir)
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "plain" -> (() => Relational.q24PlainJoin(t.lineitem, t.orders)),
      "salted_all" -> (() => Relational.q24SaltedJoinAll(t.lineitem, t.orders)),
      "salted_targeted" -> (() => Relational.q24SaltedJoin(t.lineitem, t.orders)),
      // the user-keyed window family's representative: one exchange on
      // user_id + an in-partition sort — the "hot key ⇒ bigger
      // external sort, never memory" claim under the same knob
      "window_session_gap" -> (() => graft.operators.EventOps.sessionGap(t.events)),
      "window_rate_limit" -> (() => graft.operators.EventOps.rateLimit(t.events)))
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
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    println(s"""{"metric":"q24_arms","passes":$passes,"shuffle_partitions":$parts,""" +
      s""""queries":$qs,"sf":${JsonUtil.str(sfDir)}}""")
    spark.stop()
  }
}
