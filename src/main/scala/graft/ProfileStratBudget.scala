package graft

import org.apache.spark.sql.functions._

/** Price the `candBudgetPerDoc` knob exactly (VERDICT r11 #4's other
  * half): ProfileStratRecall measures recall AT chosen budgets; this
  * computes, from the same corpus probe the operator itself runs
  * (class histogram + background-similarity estimate), the MINIMUM
  * budget at which each size-class gap's arm survives
  * [[graft.operators.Dedup.stratifiedArms]] — and whether a gap is
  * purchasable at ANY budget or falls to the recall floor (an arm
  * whose only affordable geometry has worst-case recall < 0.5 is
  * dropped no matter what the caller pays; the lossless
  * `containmentPairsLsh` is the path for those corpora). Output is
  * the per-gap threshold table SCALING.md's recall/cost curve cites,
  * so a user can read off "gap g costs ≥ B candidates/doc here"
  * instead of bisecting with hour-long recall runs.
  *
  * Usage: runMain graft.ProfileStratBudget [sfDir] [tau%] [maxGap] [bandBudget]
  */
object ProfileStratBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10gen"
    val tauNum = if (args.length > 1) args(1).toInt else 80
    val maxGap = if (args.length > 2) args(2).toInt else 5
    val bandBudget = if (args.length > 3) args(3).toInt else 64
    val spark = GraftSession.local(32)

    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val tri = graft.operators.Dedup.shingleFps(docs).persist()
    try {
      // the operator's own probe, replicated: per-doc fingerprint
      // count → size class; corpus occupancy + distinct vocab →
      // expected random-pair Jaccard (jBg)
      val hist = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("s"))
        .withColumn("cls", floor(log2(col("s"))).cast("int"))
        .groupBy(col("cls")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val probe = tri.agg(count(lit(1)).as("occ"),
        approx_count_distinct(col("h")).as("v")).head()
      val (occ, vocab) = (probe.getLong(0), math.max(probe.getLong(1), 1L))
      val nDocs = hist.values.sum
      val sBar = if (nDocs == 0) 0.0 else occ.toDouble / nDocs
      val eInter = math.min(sBar * sBar / vocab, sBar)
      val jBg = math.max(1e-12,
        math.min(0.999, eInter / math.max(2 * sBar - eInter, 1e-9)))
      def pairsAtGap(g: Int): Double =
        if (g == 0) hist.values.map(n => n.toDouble * (n - 1) / 2).sum
        else hist.map { case (c, n) =>
          n.toDouble * hist.getOrElse(c + g, 0L).toDouble }.sum
      println(f"[strat-budget] corpus=$sfDir docs=$nDocs sBar=$sBar%.1f " +
        f"vocab=$vocab jBg=$jBg%.3e")
      (0 to maxGap).foreach(g =>
        println(f"[strat-budget] gap=$g classPairs=${pairsAtGap(g)}%.3e"))

      val tau = tauNum.toDouble / 100
      def armAt(g: Int, budgetPerDoc: Double) =
        graft.operators.Dedup.stratifiedArms(tau, maxGap, bandBudget, jBg,
          pairsAtGap, budgetPerDoc * math.max(nDocs, 1L))(g)
      // threshold per gap: smallest integer budget whose arm is kept
      // (monotone in budget by construction — the while loop only
      // relaxes as candBudget grows), found by doubling + bisection;
      // a gap not kept at 2^40 is unpurchasable (recall floor).
      (0 to maxGap).foreach { g =>
        if (pairsAtGap(g) == 0.0)
          println(s"[strat-budget] gap=$g: no occupied class pair (non-event)")
        else if (armAt(g, math.pow(2, 40)).isLeft)
          println(s"[strat-budget] gap=$g: UNPURCHASABLE at any budget — every " +
            "affordable geometry is under the 0.5 recall floor " +
            "(containmentPairsLsh is the lossless path)")
        else {
          var lo = 0.0; var hi = 1.0
          while (armAt(g, hi).isLeft) { lo = hi; hi *= 2 }
          while (hi - lo > 1.0) {
            val mid = math.floor((lo + hi) / 2)
            if (armAt(g, mid).isLeft) lo = mid else hi = mid
          }
          val a = armAt(g, hi).toOption.get
          println(f"[strat-budget] gap=$g minBudgetPerDoc=${hi}%.0f " +
            f"arm=(r=${a.r},b=${a.b}) worstCaseRecall=${a.recall}%.3f " +
            f"expectedBgCands=${pairsAtGap(g) * a.b * math.pow(jBg, a.r)}%.3e")
        }
      }
    } finally tri.unpersist(blocking = false)
    spark.stop()
  }
}
