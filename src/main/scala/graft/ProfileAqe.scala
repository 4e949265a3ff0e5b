package graft

/** Scratch profiler for the round-8 initialPartitionNum regression
  * (VERDICT r8 #1): times the three regressed rows plus a flat control
  * under each runtime-config arm, interleaved, same JVM. Arms:
  *
  *   A. initialPartitionNum = 32   (the r7 baseline shape)
  *   B. initialPartitionNum = 1024 (the r8 sf100 fix — the regression)
  *   C. B + spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
  *      = true — the hypothesis: the regressed operators' final stages
  *      read PERSISTED subtrees, and by default AQE is forbidden from
  *      coalescing shuffle partitions inside a plan that is being
  *      cached (the cached plan's output partitioning must stay
  *      reusable), so every cached shuffle runs at the full initial
  *      width; the conf lifts that restriction.
  *
  * Dev tool; SCALING.md records the verdict.
  */
object ProfileAqe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32)
    val queries = Seq("dd_containment_lsh", "dd_containment_auto",
      "dd_jaccard_lsh", "dd_minhash_lsh")
    val arms = Seq(
      ("A_init32", "32", "false"),
      ("B_init1024", "1024", "false"),
      ("C_init1024_cachedAqe", "1024", "true"))
    // warm-up: every query once under every arm (codegen + JIT)
    for ((_, init, cached) <- arms; q <- queries) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", cached)
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (p <- 1 to passes; (arm, init, cached) <- arms; q <- queries) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", cached)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      acc((arm, q)) = s :: acc((arm, q))
      spark.catalog.clearCache()
      // blocking: async block cleanup from this query must not bleed
      // into the next timed measurement
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"[aqe] pass $p $arm%-22s $q%-22s $s%7.2f s")
    }
    println("[aqe] === min per (arm, query) ===")
    for ((arm, _, _) <- arms; q <- queries)
      println(f"[aqe] $arm%-22s $q%-22s ${acc((arm, q)).min}%7.2f s")
    spark.stop()
  }
}
