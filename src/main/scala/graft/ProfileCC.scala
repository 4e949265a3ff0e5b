package graft

import org.apache.spark.sql.functions._

/** Decompose dd_cluster_cc's sf100 cost (VERDICT r11 #5: 82.4 s,
  * 15× sf10→sf100 — log-round growth or per-round spill?). At
  * generated sf100 the pair graph is ~257 k edges, UNDER the 2²⁰
  * driver cap, so there are no distributed rounds at all — the
  * operator is pair-source + driver union-find + label attach. This
  * times each stage in isolation so the 15× is attributed, not
  * guessed:
  *
  *  1. `pairs`  — ngramJaccardAdaptive alone (the dd_jaccard_adaptive
  *     bench row, re-measured in-context);
  *  2. `cc`     — connectedComponents over CHECKPOINTED pairs (the
  *     union-find + attach, no pair-source recompute);
  *  3. `attach` — the attach/orderBy tail alone over a synthetic
  *     label set (scan + broadcast join + global sort of the corpus).
  *
  * Usage: runMain graft.ProfileCC [sfDir] [passes]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10gen"
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local(32)

    val docs = graft.sources.Tables(spark, sfDir).documents
    def timeIt(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cc] stage=$tag%-8s sec=$sec%8.2f")
      System.gc(); Thread.sleep(300)
      sec
    }

    // pair source once for the cc stage (untimed here; timed as its own stage)
    val pairsCk = graft.operators.Caching.materialize(
      graft.operators.Dedup.ngramJaccardAdaptive(docs)
        .select(col("doc1"), col("doc2")))
    println(s"[cc] edges=${pairsCk.count()}")

    (1 to passes).foreach { p =>
      println(s"[cc] pass=$p")
      timeIt("full")(graft.operators.Dedup.connectedComponents(
        docs, graft.operators.Dedup.ngramJaccardAdaptive(docs)))
      timeIt("pairs")(graft.operators.Dedup.ngramJaccardAdaptive(docs))
      timeIt("cc")(graft.operators.Dedup.connectedComponents(docs, pairsCk))
      // attach tail alone: empty label set → pure scan + sort shape
      timeIt("attach")(graft.operators.Dedup.connectedComponents(
        docs, pairsCk.limit(0)))
    }
    spark.stop()
  }
}
