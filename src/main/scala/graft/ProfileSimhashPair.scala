package graft

import org.apache.spark.sql.functions._

/** Scratch profiler: which arm does the adaptive Hamming pairer pick
  * on this corpus, and what does each stage cost? (dev tool;
  * SCALING.md records the verdict)
  */
object ProfileSimhashPair {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10gen")
    val spark = GraftSession.local(32)
    val docs = graft.sources.Tables(spark, sfDir).documents
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = graft.operators.Dedup.simhashSignatures(docs)
      .select(col("doc_id"), col("sim").as("phash"))
    t("signatures (count)")(sigs.count())
    val cached = sigs.persist()
    t("persist materialize")(cached.count())
    val strat = t("probe")(graft.operators.Multimodal.phashStrategy(cached))
    println(s"[prof] strategy: $strat")
    t("banded arm")(graft.operators.Multimodal.phashPairs(cached).count())
    t("mih arm")(graft.operators.Multimodal.phashPairsMih(cached).count())
    cached.unpersist(blocking = true)
    t("auto end-to-end")(
      graft.operators.Dedup.simhashNearDup(docs).count())
    spark.stop()
  }
}
