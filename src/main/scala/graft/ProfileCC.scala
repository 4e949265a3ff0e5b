package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the connected-components paths at scale
  * (round-8 verdict item 3b): records the pair-graph edge count —
  * i.e. which CC path the default cap dispatches — and times the
  * driver union-find fast path against the FORCED distributed
  * pointer-jumping loop on the same pair graph. Dev tool; SCALING.md
  * records the verdict.
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10gen2")
    val passes = sys.env.getOrElse("PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, sfDir).documents
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // the pair source both consumers feed from, materialized once so
    // the CC arms time ONLY the clustering (parquet round-trip keeps
    // the input identical and un-cached between passes)
    val pairPath = s"/tmp/cc_pairs_${math.abs(sfDir.hashCode)}.parquet"
    graft.operators.Dedup.ngramJaccardAdaptive(docs)
      .select(col("doc1"), col("doc2"))
      .write.mode("overwrite").parquet(pairPath)
    val pairs = spark.read.parquet(pairPath)
    val nEdges = pairs.count()
    val nDocs = docs.count()
    System.err.println(s"[cc] $sfDir: docs=$nDocs pairEdges=$nEdges " +
      s"(driver cap 2^20=${1 << 20}; default path = " +
      s"${if (nEdges <= (1 << 20)) "driver union-find" else "distributed pointer-jumping"})")
    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        release()
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        if (s < best) best = s
        System.err.println(f"[cc] $label%-34s $s%8.2f s  rows=$n")
      }
      System.err.println(f"[cc] $label%-34s min $best%8.2f s")
    }
    time("cc default (driver if <= cap)")(
      graft.operators.Dedup.connectedComponents(docs, pairs).count())
    time("cc forced distributed")(
      graft.operators.Dedup.connectedComponents(docs, pairs,
        maxDriverEdges = 0).count())
    spark.stop()
  }
}
