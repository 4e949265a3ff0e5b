package graft

/** Paired A/B of `canChangeCachedPlanOutputPartitioning` over
  * representative UNTOUCHED queries (VERDICT r9 "what's wrong" #5):
  * the r9 bench showed a uniform ~6% geomean drift vs r8 across rows
  * the round did not touch, and the cached-plan conf was the only
  * code difference — this isolates whether the conf levies a
  * re-planning tax on queries it was never aimed at, or the drift was
  * machine noise. Interleaved arms, same JVM, min over N passes —
  * the ProfileAqe methodology. SCALING.md records the verdict.
  */
object ProfileConfAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.local(32)
    // a cross-section of families, none of them the three targeted
    // rows: scans/aggs, joins, windows, text, sampling, ANN, events
    val queries = Seq("q1_agg", "q3_topk", "q7_window_rank", "q24_salted_join",
      "ev_session_gap", "ev_journeys", "txt_tokens", "txt_tfidf_terms",
      "samp_dsir", "ann_ivf_topk", "pipe_curate", "q16_crossjoin_small")
    val arms = Seq(("conf_off", "false"), ("conf_on", "true"))
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    for ((_, v) <- arms; q <- queries) { // warm: codegen + JIT per arm
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v)
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      release()
    }
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (p <- 1 to passes; (arm, v) <- arms; q <- queries) {
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      acc((arm, q)) = s :: acc((arm, q))
      release()
      println(f"[ab] pass $p $arm%-9s $q%-20s $s%7.2f s")
    }
    println("[ab] === min per (arm, query), ratio on/off ===")
    val ratios = queries.map { q =>
      val off = acc(("conf_off", q)).min
      val on = acc(("conf_on", q)).min
      println(f"[ab] $q%-20s off=$off%6.2f on=$on%6.2f ratio=${on / off}%5.3f")
      on / off
    }
    val geomean = math.exp(ratios.map(math.log).sum / ratios.size)
    println(f"[ab] geomean on/off = $geomean%5.3f")
    spark.stop()
  }
}
