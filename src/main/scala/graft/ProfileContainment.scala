package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler: decompose the containment-LSH candidate
  * generator into its stages and time three df-attachment shapes —
  * window-over-h, groupBy+join over a persisted shingle table
  * (round-5's), and groupBy+join unpersisted — so the PLANS.md /
  * SCALING.md verdict on the flattened shape rests on measured parts,
  * not end-to-end guesswork (dev tool; PLANS.md records the verdict).
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val (tauNum, tauDenom) = (80, 100)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f; release() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; release()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-34s min ${ts.min}%6.2f s  max ${ts.max}%6.2f s")
    }

    import graft.operators.Dedup
    val tri = Dedup.shingleFps(docs)
    val prefixLen = (col("s") - expr(s"(s * $tauNum + ${tauDenom - 1}) div $tauDenom") + 1)
      .cast("int")

    // stage 1: the shingling scan alone
    time("shingleFps scan")(noop(tri))
    // stage 2a: df by window over h
    val triDfW = tri.withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
    time("df window(h)")(noop(triDfW))
    // stage 2b: df by agg + join, tri persisted (r5 shape)
    time("df agg+join, tri persisted") {
      val t = Dedup.shingleFps(docs).persist()
      val dfT = t.groupBy(col("h")).agg(count(lit(1)).as("df"))
      noop(t.join(dfT, Seq("h")))
    }
    // stage 3: the struct-sort doc-sets aggregation (from the window)
    val docSetsStruct = triDfW.groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(df, h))), x -> x.h)").as("harr"),
        count(lit(1)).as("s"))
      .withColumn("prefix_len", prefixLen)
    time("docSets struct-sort agg")(noop(docSetsStruct))
    // stage 3b: long-only sort agg (no df order) for comparison
    time("docSets long-sort agg")(noop(
      tri.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("h"))).as("harr"), count(lit(1)).as("s"))))
    // stage 4: candidates from the struct-ordered sets
    def candsOf(docSets: DataFrame): DataFrame = {
      val probes = docSets.select(col("doc_id").as("pd"), col("s").as("ps"),
        explode(slice(col("harr"), lit(1), col("prefix_len"))).as("h"))
      val index = docSets.select(col("doc_id").as("ix"), col("s").as("is"),
        explode(col("harr")).as("h"))
      probes.join(index, Seq("h"))
        .filter(col("pd") =!= col("ix") && col("ps") <= col("is"))
        .select(least(col("pd"), col("ix")).as("doc1"),
          greatest(col("pd"), col("ix")).as("doc2"))
        .distinct()
    }
    time("cands (docSets persisted)") {
      val ds = docSetsStruct.persist()
      noop(candsOf(ds))
    }
    // stage 5: full operator, both entry points
    time("full containmentPairsLsh")(noop(Dedup.containmentPairsLsh(docs)))
    time("full containmentPairs")(noop(Dedup.containmentPairs(docs)))
    println("[prof] cand count: " + {
      val ds = docSetsStruct.persist()
      val n = candsOf(ds).count(); release(); n
    })
    spark.stop()
  }
}
