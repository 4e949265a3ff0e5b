package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the adaptive Hamming pairer's epilogue
  * configurations (round 8): forced arms vs auto with the upstream-
  * sampled no-persist probe vs auto with the persisted-cache probe,
  * on the per-row signature front-end. Dev tool; SCALING.md records
  * the verdict.
  */
object ProfilePairerAuto {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1gen2")
    val passes = sys.env.getOrElse("PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, sfDir).documents
    def sigs(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.simhashSignatures(d)
        .select(col("doc_id"), col("sim").as("phash"))
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        release()
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        if (s < best) best = s
        System.err.println(f"[pairer] $label%-28s $s%8.2f s  rows=$n")
      }
      System.err.println(f"[pairer] $label%-28s min $best%8.2f s")
    }
    import graft.operators.Multimodal
    time("banded forced")(Multimodal.phashPairs(sigs(docs)).count())
    time("mih forced")(Multimodal.phashPairsMih(sigs(docs)).count())
    time("auto (checkpointed table)")(Multimodal.phashPairsAuto(sigs(docs)).count())
    spark.stop()
  }
}
