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
      // the operator's own probe, SHARED (Dedup.corpusProbeOnFps —
      // one definition, so this tool's advertised "the guard's real
      // decision boundary, not a fit" stays true by construction if
      // the jBg formula or class binning ever changes)
      val probe = graft.operators.Dedup.corpusProbeOnFps(tri)
      import probe.{jBg, nDocs, pairsAtGap, sBar, vocab}
      println(f"[strat-budget] corpus=$sfDir docs=$nDocs sBar=$sBar%.1f " +
        f"vocab=$vocab jBg=$jBg%.3e")
      (0 to maxGap).foreach(g =>
        println(f"[strat-budget] gap=$g classPairs=${pairsAtGap(g)}%.3e"))

      val tau = tauNum.toDouble / 100
      // deliberately calls the operator's full arm sequence and
      // indexes one gap: stratifiedArms is the exact shipped code
      // path, and per-gap arms are independent (the seq is a map over
      // gaps), so slicing is correct; the recompute per bisection
      // probe is pure driver arithmetic at maxGap ≤ 5 — not worth a
      // single-gap variant that could drift from the operator
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
